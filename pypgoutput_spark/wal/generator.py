"""Deterministic synthetic pgoutput WAL stream generator.

Replaces the reference's live-Postgres source (reference reader.py:334-390
``ExtractRaw``) with a seeded, distributed, *SQL-expressible* generator:

  - The **logical change-event stream** over the target table
    ``(repo, path, commit, lang, content)`` is defined purely by
    deterministic SQL expressions (md5-derived integers) that evaluate
    identically in Spark SQL and DuckDB. That makes the end-to-end
    pipeline (encode → binary WAL frames → vectorized decode → LWW →
    merge) verifiable against an independent DuckDB oracle that never
    touches the binary path.
  - The **wire frames** are produced by encoding that stream through
    :mod:`pypgoutput_spark.wal.codec` inside a ``mapInPandas`` stage —
    Arrow-batched, no driver-side loops, no shuffle (LSNs are assigned
    arithmetically, not by row_number).

Stream shape (per generation parameters):
  - ``n_txns`` transactions of exactly ``ops_per_txn`` DML ops each.
  - Frame LSNs: txn ``t`` occupies ``[base, base + ops + 1]`` with
    ``base = 10 + t * (ops_per_txn + 2)``: Begin at ``base``, ops at
    ``base+1+k``, Commit at ``base+ops+1``. Monotone, gap-free per txn.
  - WAL **segments**: ``segment = txn div txns_per_segment``. Segments are
    the unit of parallel decode; transactions never straddle segments.
  - Ops: I / U / D mix by hash; optionally a Truncate as the first op of
    every ``truncate_every``-th txn.
  - Hot-key skew: ``hot_pct`` % of ops hit one of ``n_hot`` hot repos
    (integer-exact skew — no floats, so both engines agree bit-for-bit).
  - TOAST: ``toast_pct`` % of updates send ``content`` as an unchanged
    TOAST cell (category 'u', value not on the wire) — the merge must
    preserve the target's value (reference loses this distinction at
    reader.py:63-69; we keep it, see SURVEY.md §7).
  - ``lang`` is NULL for one of five hash buckets → exercises the 'n'
    (NULL) tuple category end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, List, Sequence, Tuple

from pypgoutput_spark.wal import codec

# the fixed target relation (BASELINE.json input_hint)
RELATION_ID = 51234
RELATION_NAMESPACE = "public"
RELATION_NAME = "repo_files"
#: multi-relation streams use RELATION_ID + k for k in [0, n_relations)
#: (reference processes any number of interleaved relations, keyed by
#: relation_id — reader.py:124-132, 252-258)
RELATION_NAMES = ("repo_files", "repo_files_aux", "repo_files_3", "repo_files_4")
#: (part_of_pkey, name, pg_type_oid, atttypmod) — all text, keys (repo, path)
RELATION_COLUMNS: Tuple[Tuple[int, str, int, int], ...] = (
    (1, "repo", 25, -1),
    (1, "path", 25, -1),
    (0, "commit", 25, -1),
    (0, "lang", 25, -1),
    (0, "content", 25, -1),
)
KEY_COLUMNS = ("repo", "path")
VALUE_COLUMNS = ("commit", "lang", "content")
ALL_COLUMNS = KEY_COLUMNS + VALUE_COLUMNS
#: the relation after ``evolve_at_txn``'s DDL: trailing BIGINT ``stars``
EVOLVED_COLUMNS = RELATION_COLUMNS + ((0, "stars", 20, -1),)


@dataclass(frozen=True)
class GenParams:
    n_txns: int = 100
    ops_per_txn: int = 10
    n_repos: int = 50
    n_paths: int = 40
    seed: str = "s42"
    toast_pct: int = 25          # % of U ops with unchanged-TOAST content
    truncate_every: int = 0      # every k-th txn starts with a Truncate (0 = never)
    hot_pct: int = 20            # % of ops routed to hot repos
    n_hot: int = 2
    insert_pct: int = 60
    update_pct: int = 30         # delete_pct = 100 - insert - update
    txns_per_segment: int = 25
    content_repeat_max: int = 6
    n_relations: int = 1         # ops fan out over RELATION_ID + (0..n-1)
    #: % of U ops that CHANGE the key (repo,path): the wire carries a 'K'
    #: before-image with the OLD key (reference test_reader.py:231-251);
    #: replay = delete old key + upsert new key. The toast draw is
    #: independent, so key-change updates can ALSO carry an
    #: unchanged-TOAST content cell — real pgoutput emits that
    #: combination; the pipeline resolves it with kc_toast_passes > 0
    #: (operators.kc_toast) and the oracle replays the same bounded-pass
    #: algorithm (see duckdb_final_state_sql).
    key_change_pct: int = 0
    #: % of txns emitted as protocol-v2 STREAMED transactions (PG14+
    #: ``streaming = on``): S(xid) + xid-prefixed DML + E, then a Stream
    #: Commit 'c' — or a Stream Abort 'A' for ``stream_abort_pct`` % of
    #: them, whose events must vanish from the final state. By default
    #: one chunk per stream with the commit immediately after; set
    #: ``interleave_streams`` for multi-chunk interleaved pairs
    #: (subxid-abort grammar is pinned by tests/test_streamed_tx.py
    #: with hand-built frames). The serial oracle replays by LSN
    #: exactly as for v1 in both layouts.
    stream_pct: int = 0
    stream_abort_pct: int = 0
    #: interleave the CHUNKS of adjacent streamed transactions — the
    #: shape a real busy PG14+ walsender emits with ``streaming = on``
    #: (the reason in-chunk messages carry an xid at all). Adjacent
    #: streamed txns (2k, 2k+1) each split their DML into two chunks
    #: laid out S1 dml1a E S2 dml2a E S1' dml1b E S2' dml2b E c1 c2
    #: inside the pair's combined LSN window; unpaired streamed txns
    #: keep the serial single-chunk layout. Event LSNs are remapped by
    #: the same closed-form expression on BOTH the frame side and the
    #: oracle side, so the serial replay-by-LSN oracle still holds.
    interleave_streams: bool = False
    #: schema evolution: from txn k on, the relation carries a trailing
    #: ``stars`` BIGINT column (OID 20) — a Relation re-send (the DDL's
    #: wire echo, reference reader.py:222-243) lands in the LSN gap
    #: before txn k, and every later I/U frame encodes the 6th cell
    #: (D before-images pad it with 'n'). Events before the boundary
    #: decode under v0; the merge evolves the lake table and aligns old
    #: rows with NULL. 0 = never.
    evolve_at_txn: int = 0
    #: % of txns emitted as PREPARED transactions (PG15+ ``two_phase``
    #: slot option): the body arrives as Begin Prepare 'b' .. Prepare 'P'
    #: at the txn's own slot window, and the DECISION — Commit Prepared
    #: 'K', or Rollback Prepared 'r' for ``two_phase_rollback_pct`` % of
    #: them — lands ``two_phase_gap`` txn windows LATER (possibly a later
    #: segment, and with multi-batch ingest a later micro-batch: the
    #: engine must stage the prepared events until the decision arrives).
    #: Rolled-back transactions' events must vanish from the final state.
    #: Composes with ``stream_pct`` (PG15 ``streaming = on, two_phase =
    #: on``): a txn drawing BOTH streamed and prepared seals its stream
    #: with Stream Prepare 'p' instead of Stream Commit 'c' — the v2
    #: spelling of 'P' — and its decision arrives as the same K/r frame
    #: ``two_phase_gap`` windows later. Prepared streamed txns never
    #: draw a Stream Abort (PG aborts a to-be-prepared txn BEFORE the
    #: prepare; after 'p' only K/r can decide it).
    two_phase_pct: int = 0
    two_phase_rollback_pct: int = 0
    two_phase_gap: int = 4
    #: % of txns carrying a replication-origin message 'O' right after
    #: Begin (their rows were replicated FROM another node — the
    #: active-active loop-prevention signal). The engine's
    #: ``skip_foreign_origins`` filtering drops those txns' events; the
    #: oracle replays with ``filter_foreign_origins=True``. Composes
    #: with the plain v1 layout and with serial v2 streams
    #: (``stream_pct``, a foreign streamed txn carries an xid-prefixed
    #: in-chunk 'O'); the DML slots shift by one to make room for the
    #: 'O' frame between Begin/Stream-Start and the first event.
    origin_pct: int = 0
    origin_name: str = "node_b"
    #: emit Stream Abort in its protocol-v4 form (PG16 ``streaming =
    #: parallel``): the v2 xid+subxid body plus abort LSN + abort
    #: timestamp. Decode-transparent (both kernels read the fixed v2
    #: prefix); the trailer is surfaced by ``codec.decode_message``.
    abort_v4: bool = False

    def __post_init__(self):
        if self.interleave_streams and self.txns_per_segment % 2:
            raise ValueError(
                "interleave_streams requires an even txns_per_segment "
                "(a chunk pair must not straddle a segment boundary — "
                "streams must commit within their decode partition)"
            )
        if self.evolve_at_txn > 0 and (
            self.stream_pct > 0 or self.key_change_pct > 0 or self.n_relations > 1
        ):
            raise ValueError(
                "evolve_at_txn composes only with the plain v1 layout "
                "(no streamed txns, key changes, or multi-relation fanout)"
            )
        if self.two_phase_pct > 0 and (
            self.key_change_pct > 0 or self.evolve_at_txn > 0
        ):
            raise ValueError(
                "two_phase_pct composes only with the plain v1 layout "
                "(key-change / evolution mixes are out of scope)"
            )
        if self.two_phase_pct > 0 and self.interleave_streams:
            raise ValueError(
                "two_phase_pct does not compose with interleave_streams "
                "(the interleaved pair layout has no decision slot)"
            )
        if self.two_phase_pct > 0 and self.two_phase_gap < 1:
            raise ValueError("two_phase_gap must be >= 1")
        if self.origin_pct > 0 and (
            self.interleave_streams or self.two_phase_pct > 0
            or self.evolve_at_txn > 0 or self.key_change_pct > 0
        ):
            raise ValueError(
                "origin_pct composes with the plain v1 layout and serial "
                "v2 streams only (no interleave/two-phase/evolve/"
                "key-change)"
            )

    @property
    def n_ops(self) -> int:
        return self.n_txns * self.ops_per_txn

    @property
    def lsn_stride(self) -> int:
        if self.interleave_streams and self.stream_pct > 0:
            # a pair's window must fit 2*ops DML + 8 chunk delimiters +
            # 2 commits: 2*stride >= 2*ops + 10
            return self.ops_per_txn + 5
        # streamed txns need slots for E and c/A after the DML run;
        # schema evolution keeps one spare LSN per txn window so the
        # Relation re-send frame has a home between two transactions;
        # two-phase keeps one spare slot per window as the home of the
        # decision frame TARGETING it (txn t's K/r lands at window t+gap,
        # slot ops+2 — windows collide for no two source txns). The
        # stream × two-phase composition needs BOTH: ops+2 for the
        # stream closer ('c'/'A'/'p') and ops+3 for the decision frame
        # targeting the window.
        if self.two_phase_pct > 0 and self.stream_pct > 0:
            return self.ops_per_txn + 4
        if self.origin_pct > 0:
            # slot 1 is the 'O' frame; DML shifts to slots 2..ops+1,
            # Commit/Stream-Stop to ops+2 (+ the stream closer at ops+3
            # when serial v2 streams compose in)
            return self.ops_per_txn + (4 if self.stream_pct > 0 else 3)
        return self.ops_per_txn + (
            3 if self.stream_pct > 0 or self.evolve_at_txn > 0
            or self.two_phase_pct > 0 else 2
        )


# ---------------------------------------------------------------------------
# dialect-parameterized SQL expressions for the logical event stream
# ---------------------------------------------------------------------------


class _Dialect:
    """Tiny SQL expression factory valid in both Spark SQL and DuckDB."""

    def __init__(self, name: str):
        assert name in ("spark", "duckdb")
        self.name = name

    def h(self, *parts: str) -> str:
        """Deterministic non-negative bigint from md5 of concatenated parts.

        parts are SQL expressions (already stringly-typed or literal).
        15 hex chars < 2^60 so it always fits a signed bigint.
        """
        cat = ", ".join(parts)
        if self.name == "spark":
            return f"CAST(conv(substring(md5(concat({cat})), 1, 15), 16, 10) AS BIGINT)"
        return f"(('0x' || substr(md5(concat({cat})), 1, 15))::BIGINT)"

    def s(self, expr: str) -> str:
        """Cast to string."""
        if self.name == "spark":
            return f"CAST({expr} AS STRING)"
        return f"CAST({expr} AS VARCHAR)"

    def idiv(self, a: str, b: str) -> str:
        if self.name == "spark":
            return f"({a} DIV {b})"
        return f"({a} // {b})"


def event_exprs(p: GenParams, dialect: str) -> dict:
    """SQL expressions for every logical-event column, keyed by name.

    All expressions reference a single input column ``i`` (the global op
    index, 0-based). Evaluating them over ``range(0, n_ops)`` in either
    engine yields the identical logical change stream.
    """
    d = _Dialect(dialect)
    q = lambda lit: f"'{lit}'"  # noqa: E731
    seed = q(p.seed)
    i_s = d.s("i")

    txn = d.idiv("i", str(p.ops_per_txn))
    op_idx = f"(i % {p.ops_per_txn})"
    if p.interleave_streams and p.stream_pct > 0:
        lsn = _interleave_event_lsn(
            p, txn, op_idx, interleave_exprs(p, d, txn)
        )
    elif p.origin_pct > 0:
        lsn = f"(10 + {txn} * {p.lsn_stride} + 2 + {op_idx})"
    else:
        lsn = f"(10 + {txn} * {p.lsn_stride} + 1 + {op_idx})"

    h_op = d.h(seed, q(":op:"), i_s)
    op_core = (
        f"CASE WHEN {h_op} % 100 < {p.insert_pct} THEN 'I' "
        f"WHEN {h_op} % 100 < {p.insert_pct + p.update_pct} THEN 'U' ELSE 'D' END"
    )
    if p.truncate_every > 0:
        # a truncate inside a STREAMED or PREPARED transaction is refused
        # by the engine (its commit/abort is unknown when the driver
        # plans the truncate barrier) — such txns draw plain DML instead
        t_guard = ""
        if p.stream_pct > 0:
            streamed_t, _ = stream_exprs(p, d, txn)
            t_guard += f" AND NOT {streamed_t}"
        if p.two_phase_pct > 0:
            prepared_t, _ = two_phase_exprs(p, d, txn)
            t_guard += f" AND NOT {prepared_t}"
        if p.origin_pct > 0:
            # a truncate inside a foreign-origin txn is refused by the
            # engine under skip_foreign_origins — foreign txns draw
            # plain DML instead
            t_guard += f" AND NOT {origin_exprs(p, d, txn)}"
        op = (
            f"CASE WHEN ({txn} % {p.truncate_every}) = 0 AND {op_idx} = 0"
            f"{t_guard} THEN 'T' ELSE {op_core} END"
        )
    else:
        op = op_core

    h_hot = d.h(seed, q(":hot:"), i_s)
    h_hotpick = d.h(seed, q(":hotpick:"), i_s)
    h_repo = d.h(seed, q(":repo:"), i_s)
    repo_idx = (
        f"CASE WHEN {h_hot} % 100 < {p.hot_pct} THEN {h_hotpick} % {p.n_hot} "
        f"ELSE {h_repo} % {p.n_repos} END"
    )
    repo = f"concat('repo-', lpad({d.s(repo_idx)}, 5, '0'))"
    if p.two_phase_pct > 0:
        # LOCK-FAITHFULNESS: a prepared transaction holds its row locks
        # until COMMIT/ROLLBACK PREPARED, so no other transaction can
        # write the same key while it is pending — a stream violating
        # that cannot come out of PostgreSQL (and the engine's staged
        # late-resolution relies on it: see pipeline.apply_frames_batch).
        # Prepared txns therefore draw keys from a namespace disjoint
        # from plain txns, sharded by txn % (gap+1): any two prepared
        # txns whose pendency windows can overlap (|t1-t2| <= gap) have
        # different residues, so they never contend either. Same-residue
        # prepared txns (>= gap+1 apart) DO share keys — LWW across
        # resolutions stays exercised.
        prepared_e, _rb = two_phase_exprs(p, d, txn)
        res = f"({txn} % {p.two_phase_gap + 1})"
        repo = (
            f"(CASE WHEN {prepared_e} THEN concat('repo-2pc', {d.s(res)}, "
            f"'-', lpad({d.s(repo_idx)}, 5, '0')) ELSE {repo} END)"
        )

    h_path = d.h(seed, q(":path:"), i_s)
    path_idx = f"({h_path} % {p.n_paths})"
    h_lang = d.h(seed, q(":lang:"), i_s)
    lang_idx = f"({h_lang} % 5)"
    lang = (
        f"CASE {lang_idx} WHEN 0 THEN 'py' WHEN 1 THEN 'java' "
        f"WHEN 2 THEN 'scala' WHEN 3 THEN 'sql' ELSE NULL END"
    )
    ext = (
        f"CASE {lang_idx} WHEN 0 THEN '.py' WHEN 1 THEN '.java' "
        f"WHEN 2 THEN '.scala' WHEN 3 THEN '.sql' ELSE '.txt' END"
    )
    path = f"concat('src/f', lpad({d.s(path_idx)}, 4, '0'), {ext})"

    commit = f"substr(md5(concat({seed}, ':commit:', {i_s})), 1, 12)"
    h_clen = d.h(seed, q(":clen:"), i_s)
    content = (
        f"repeat(concat(substr(md5(concat({seed}, ':content:', {i_s})), 1, 16), ' '), "
        f"1 + ({h_clen} % {p.content_repeat_max}))"
    )
    h_toast = d.h(seed, q(":toast:"), i_s)

    if p.key_change_pct > 0:
        h_kc = d.h(seed, q(":kc:"), i_s)
        key_change = f"(({op}) = 'U' AND {h_kc} % 100 < {p.key_change_pct})"
        # old key: a different deterministic (repo, path) pick
        h_orepo = d.h(seed, q(":orepo:"), i_s)
        h_opath = d.h(seed, q(":opath:"), i_s)
        old_repo_idx = f"({h_orepo} % {p.n_repos})"
        old_repo = f"concat('repo-', lpad({d.s(old_repo_idx)}, 5, '0'))"
        old_path_idx = f"({h_opath} % {p.n_paths})"
        h_olang = d.h(seed, q(":olang:"), i_s)
        old_ext = (
            f"CASE ({h_olang} % 5) WHEN 0 THEN '.py' WHEN 1 THEN '.java' "
            f"WHEN 2 THEN '.scala' WHEN 3 THEN '.sql' ELSE '.txt' END"
        )
        old_path = f"concat('src/f', lpad({d.s(old_path_idx)}, 4, '0'), {old_ext})"
        old_repo = f"CASE WHEN {key_change} THEN {old_repo} END"
        old_path = f"CASE WHEN {key_change} THEN {old_path} END"
        # the toast draw is INDEPENDENT of the key-change draw: key-change
        # updates can carry an unchanged-TOAST content cell (real pgoutput
        # behavior; serial semantics take the OLD key's value)
        content_unchanged = (
            f"(({op}) = 'U' AND {h_toast} % 100 < {p.toast_pct})"
        )
    else:
        old_repo = "CAST(NULL AS " + ("STRING" if dialect == "spark" else "VARCHAR") + ")"
        old_path = "CAST(NULL AS " + ("STRING" if dialect == "spark" else "VARCHAR") + ")"
        content_unchanged = f"(({op}) = 'U' AND {h_toast} % 100 < {p.toast_pct})"

    if p.n_relations > 1:
        h_rel = d.h(seed, q(":rel:"), i_s)
        rel = f"({h_rel} % {p.n_relations})"
    else:
        rel = "0"

    origin_foreign = origin_exprs(p, d, txn)
    streamed, aborted = stream_exprs(p, d, txn)
    if p.two_phase_pct > 0:
        # a rolled-back PREPARED transaction's events vanish exactly like
        # an aborted streamed transaction's — one `aborted` flag serves
        # the serial oracle for both grammars. A txn drawing BOTH
        # streamed and prepared seals with Stream Prepare 'p' and never
        # emits a Stream Abort: only its rollback draw can kill it.
        prepared_, rolled = two_phase_exprs(p, d, txn)
        if p.stream_pct > 0:
            aborted = f"(({aborted} AND NOT {prepared_}) OR {rolled})"
        else:
            aborted = f"({aborted} OR {rolled})"

    out_extra = {}
    if p.evolve_at_txn > 0:
        # the evolved column's value for post-boundary I/U events;
        # pre-boundary events never carry it (they encode 5 cells)
        h_stars = d.h(seed, q(":stars:"), i_s)
        out_extra["stars"] = (
            f"CASE WHEN {txn} >= {p.evolve_at_txn} THEN {h_stars} % 1000 END"
        )

    return {
        "i": "i",
        "txn": txn,
        "op_idx": op_idx,
        "lsn": lsn,
        "segment": d.idiv(txn, str(p.txns_per_segment)),
        "rel": rel,
        "op": op,
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "content_unchanged": content_unchanged,
        "old_repo": old_repo,
        "old_path": old_path,
        "streamed": streamed,
        "aborted": aborted,
        "origin_foreign": origin_foreign,
        **out_extra,
    }


def origin_exprs(p: GenParams, d: "_Dialect", txn_expr: str) -> str:
    """SQL boolean: does this txn carry a replication-origin message
    (its rows came from another node) — txn-level md5 draw shared by
    the event stream, the frame layout, and the serial oracle."""
    if p.origin_pct <= 0:
        return "false"
    seed = f"'{p.seed}'"
    h_or = d.h(seed, "':origin:'", d.s(txn_expr))
    return f"({h_or} % 100 < {p.origin_pct})"


def stream_exprs(p: GenParams, d: "_Dialect", txn_expr: str):
    """(streamed, aborted) SQL booleans for a txn expression — txn-level
    md5 draws shared by the event stream, the frame layout, and the
    Spark-free live producer (sources.receiver)."""
    if p.stream_pct <= 0:
        return "false", "false"
    seed = f"'{p.seed}'"
    h_st = d.h(seed, "':stream:'", d.s(txn_expr))
    streamed = f"({h_st} % 100 < {p.stream_pct})"
    h_ab = d.h(seed, "':abort:'", d.s(txn_expr))
    aborted = f"({streamed} AND {h_ab} % 100 < {p.stream_abort_pct})"
    return streamed, aborted


def two_phase_exprs(p: GenParams, d: "_Dialect", txn_expr: str):
    """(prepared, rolled_back) SQL booleans for a txn expression —
    txn-level md5 draws shared by the event stream, the frame layout,
    and the serial DuckDB oracle."""
    if p.two_phase_pct <= 0:
        return "false", "false"
    seed = f"'{p.seed}'"
    h_tp = d.h(seed, "':2pc:'", d.s(txn_expr))
    prepared = f"({h_tp} % 100 < {p.two_phase_pct})"
    h_rb = d.h(seed, "':2pcrb:'", d.s(txn_expr))
    rolled = f"({prepared} AND {h_rb} % 100 < {p.two_phase_rollback_pct})"
    return prepared, rolled


def interleave_exprs(p: GenParams, d: "_Dialect", txn_expr: str) -> str:
    """SQL boolean: is this txn half of an interleaved streamed pair —
    both members of the adjacent pair (2k, 2k+1) drew ``streamed``.
    txns_per_segment is even (enforced), so a pair never straddles a
    segment."""
    if not (p.interleave_streams and p.stream_pct > 0):
        return "false"
    partner = (
        f"(CASE WHEN ({txn_expr}) % 2 = 0 THEN ({txn_expr}) + 1 "
        f"ELSE ({txn_expr}) - 1 END)"
    )
    streamed_self, _ = stream_exprs(p, d, txn_expr)
    streamed_partner, _ = stream_exprs(p, d, partner)
    return (
        f"({streamed_self} AND {streamed_partner} AND {partner} < {p.n_txns})"
    )


def _interleave_event_lsn(p: GenParams, txn: str, op_idx: str,
                          interleaved: str) -> str:
    """Event-LSN expression under chunk interleaving: an interleaved
    pair's DML splits into halves laid out ``S1 a1 E S2 a2 E S1' b1 E
    S2' b2 E c1 c2`` inside the pair window ``[10 + 2k*stride, 10 +
    (2k+2)*stride)``. The identical expression runs in Spark AND DuckDB
    so the oracle replays the remapped order exactly."""
    ops, stride = p.ops_per_txn, p.lsn_stride
    h1 = (ops + 1) // 2  # first-chunk DML count
    off0 = (
        f"(CASE WHEN {op_idx} < {h1} THEN 1 + {op_idx} "
        f"ELSE {h1 + 5} + {op_idx} END)"
    )
    off1 = (
        f"(CASE WHEN {op_idx} < {h1} THEN {h1 + 3} + {op_idx} "
        f"ELSE {ops + 7} + {op_idx} END)"
    )
    return (
        f"(CASE WHEN {interleaved} THEN 10 + ({txn} - ({txn} % 2)) * {stride}"
        f" + (CASE WHEN ({txn} % 2) = 0 THEN {off0} ELSE {off1} END) "
        f"ELSE 10 + {txn} * {stride} + 1 + {op_idx} END)"
    )


def duckdb_events_sql(p: GenParams) -> str:
    """DuckDB query producing the logical event stream (the oracle's input)."""
    ex = event_exprs(p, "duckdb")
    cols = ",\n    ".join(f'{expr} AS "{name}"' for name, expr in ex.items() if name != "i")
    return f"SELECT i,\n    {cols}\nFROM (SELECT range AS i FROM range(0, {p.n_ops}))"


def spark_events_df(spark, p: GenParams, n_partitions: int = 0):
    """The logical event stream as a Spark DataFrame.

    Pure arithmetic over ``spark.range`` — embarrassingly parallel, no
    shuffle, deterministic regardless of parallelism (the two-cluster-size
    scaling runs consume byte-identical input).
    """
    ex = event_exprs(p, "spark")
    n_part = n_partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, p.n_ops, 1, n_part).withColumnRenamed("id", "i")
    return df.selectExpr(*[f"{expr} AS `{name}`" for name, expr in ex.items()])


# ---------------------------------------------------------------------------
# frame encoding (logical stream -> binary pgoutput WAL frames)
# ---------------------------------------------------------------------------

#: mtype = the message's first byte (B/C/R/I/U/D/T, v2 S/E/c/A), stamped by
#: the frame receiver at capture time. It lets registry extraction and
#: batch-stats scans prune the (large) payload column entirely — at 100 TB
#: that's the difference between a metadata-column scan and a full re-read
#: of the WAL. Messages INSIDE a v2 stream chunk are stamped LOWERCASE
#: ('i'/'u'/'d'/'t'): their payloads carry an xid after the type byte and
#: their effect is decided only at stream commit/abort, so metadata-only
#: driver paths (truncate-cut planning, relation-id pre-filters) must not
#: treat them as v1 frames. Protocol-v2 streams therefore REQUIRE
#: mtype-stamped frames (the receiver knows stream state at capture; the
#: payload-byte fallback predicates cannot tell v2 from v1).
#: Two-phase control frames stamp their own byte ('b'/'P'/'K') EXCEPT
#: Rollback Prepared, stamped 'x': its wire byte 'r' would collide with
#: the in-chunk-Relation metadata letter above (mtype is a capture-layer
#: convention, not the wire byte — the payload keeps the spec's 'r').
FRAMES_SCHEMA = "segment BIGINT, lsn BIGINT, mtype STRING, payload BINARY"


def _encode_stream_pandas(batches: Iterator, p: GenParams) -> Iterator:
    """mapInPandas kernel: one input row per *slot* (B, ops..., C) -> frame.

    Hot loop specialized for the fixed 5-column relation (inline byte
    building, no per-cell dispatch) — encodes ~300-500k frames/s/core so
    multi-million-event streams for the scaling benchmark stay cheap.
    Byte-compatibility with the general encoder is pinned by
    tests/test_generator.py round-trips.
    """
    import struct

    import pandas as pd

    pk_i32 = struct.Struct(">i").pack
    pk_bc = struct.Struct(">qqi").pack      # begin: lsn, ts, xid
    pk_c = struct.Struct(">bqqq").pack      # commit: flags, lsn_c, lsn_e, ts
    n_rel = max(1, p.n_relations)
    # per-relation header constants (relation id = RELATION_ID + rel index)
    rid_bes = [pk_i32(RELATION_ID + r) for r in range(n_rel)]
    I_HDRS = [b"I" + rb + b"N\x00\x05" for rb in rid_bes]
    U_HDRS = [b"U" + rb + b"N\x00\x05" for rb in rid_bes]
    D_MIDS = [b"D" + rb + b"K\x00\x05" for rb in rid_bes]
    T_PAYLOADS = [b"T" + pk_i32(1) + b"\x00" + rb for rb in rid_bes]
    B_PFX = b"B"
    # post-evolution headers: the relation is 6 columns wide from txn
    # evolve_at_txn on (evolve composes only with n_relations == 1)
    evolve_k = p.evolve_at_txn if p.evolve_at_txn > 0 else None
    I_HDR6 = b"I" + rid_bes[0] + b"N\x00\x06"
    U_HDR6 = b"U" + rid_bes[0] + b"N\x00\x06"
    D_MID6 = b"D" + rid_bes[0] + b"K\x00\x06"

    def t_cell(s: str) -> bytes:
        b = s.encode("utf-8")
        return b"t" + pk_i32(len(b)) + b

    for pdf in batches:
        payloads: List[bytes] = []
        mtypes: List[str] = []
        ap, am = payloads.append, mtypes.append
        streamed_col = (
            pdf["streamed"].tolist() if "streamed" in pdf.columns
            else [False] * len(pdf)
        )
        if evolve_k is not None and "stars" in pdf.columns:
            # the receiver's slot frames never carry stars/txn (and its
            # layout has no home for the Relation re-send) — evolve
            # params are refused there, not silently mis-encoded
            evolved_col = (pdf["txn"].values >= evolve_k).tolist()
            stars_col = pdf["stars"].tolist()
        else:
            evolved_col = [False] * len(pdf)
            stars_col = [None] * len(pdf)
        for kind, lsn, cts, xid, rel, op, repo, path, commit, lang, content, unch, orepo, opath, strm, evo, stars in zip(
            pdf["kind"].tolist(), pdf["lsn"].tolist(), pdf["commit_ts_us"].tolist(),
            pdf["xid"].tolist(), pdf["rel"].tolist(), pdf["op"].tolist(),
            pdf["repo"].tolist(),
            pdf["path"].tolist(), pdf["commit"].tolist(), pdf["lang"].tolist(),
            pdf["content"].tolist(), pdf["content_unchanged"].tolist(),
            pdf["old_repo"].tolist(), pdf["old_path"].tolist(), streamed_col,
            evolved_col, stars_col,
        ):
            if kind == "B":
                ap(B_PFX + pk_bc(lsn, cts, xid))
                am("B")
            elif kind == "C":
                ap(b"C" + pk_c(0, lsn - 1, lsn, cts))
                am("C")
            elif kind == "b":  # Begin Prepare (two-phase, PG15+)
                ap(codec.encode_begin_prepare(lsn, lsn, cts, xid, f"gid-{xid}"))
                am("b")
            elif kind == "P":  # Prepare — seals the span; decision later
                ap(codec.encode_prepare(lsn - 1, lsn, cts, xid, f"gid-{xid}"))
                am("P")
            elif kind == "K":  # Commit Prepared (the decision)
                ap(codec.encode_commit_prepared(lsn - 1, lsn, cts, xid, f"gid-{xid}"))
                am("K")
            elif kind == "r":  # Rollback Prepared — mtype stamped 'x':
                # the capture-layer metadata letter must not collide with
                # the in-chunk-Relation stamp 'r' (registry predicates)
                ap(codec.encode_rollback_prepared(lsn - 1, lsn, cts, cts,
                                                  xid, f"gid-{xid}"))
                am("x")
            elif kind == "g":  # Origin 'O': rows replicated FROM another
                # node (the active-active loop-prevention signal); a
                # streamed txn's 'O' rides its first chunk — xid-prefixed
                # like any in-chunk message, mtype-stamped lowercase
                body = codec.encode_origin(lsn, p.origin_name)
                if strm:
                    ap(body[0:1] + pk_i32(xid) + body[1:])
                    am("o")
                else:
                    ap(body)
                    am("O")
            elif kind == "p":  # Stream Prepare — the v2 spelling of 'P':
                # seals a STREAMED transaction as PREPARED (PG15
                # streaming=on + two_phase=on); decision K/r arrives later
                ap(codec.encode_stream_prepare(lsn - 1, lsn, cts, xid,
                                               f"gid-{xid}"))
                am("p")
            elif kind == "S":  # protocol v2 stream start (first chunk)
                ap(b"S" + pk_i32(xid) + b"\x01")
                am("S")
            elif kind == "s":  # continuation chunk start (first_segment=0)
                ap(b"S" + pk_i32(xid) + b"\x00")
                am("S")
            elif kind == "E":
                ap(b"E")
                am("E")
            elif kind == "c":
                ap(b"c" + pk_i32(xid) + b"\x00" + struct.pack(">qqq", lsn - 1, lsn, cts))
                am("c")
            elif kind == "A":
                if p.abort_v4:  # PG16 streaming=parallel spelling
                    ap(b"A" + pk_i32(xid) + pk_i32(xid)
                       + struct.pack(">qq", lsn - 1, cts))
                else:
                    ap(b"A" + pk_i32(xid) + pk_i32(xid))
                am("A")
            elif op == "I" or op == "U":
                # in-chunk v2 messages carry the xid after the type byte
                pfx = pk_i32(xid) if strm else b""
                cells = (
                    t_cell(repo) + t_cell(path) + t_cell(commit)
                    + (t_cell(lang) if lang is not None else b"n")
                    + (b"u" if (op == "U" and unch) else t_cell(content))
                )
                if evo:
                    ap(
                        (I_HDR6 if op == "I" else U_HDR6)[0:1] + pfx
                        + (I_HDR6 if op == "I" else U_HDR6)[1:]
                        + cells + t_cell(str(int(stars)))
                    )
                    am(op.lower() if strm else op)
                    continue
                if op == "U" and orepo is not None:
                    # key-change update: 'K' before-image with the OLD key
                    # (pgoutput sends it when key columns changed; reference
                    # asserts the old key at tests/test_reader.py:231-251)
                    old = b"K\x00\x05" + t_cell(orepo) + t_cell(opath) + b"nnn"
                    ap(b"U" + pfx + rid_bes[rel] + old + b"N\x00\x05" + cells)
                else:
                    h = I_HDRS[rel] if op == "I" else U_HDRS[rel]
                    ap(h[0:1] + pfx + h[1:] + cells)
                # in-stream frames are mtype-stamped LOWERCASE by the
                # capture layer: metadata-only driver paths (truncate-cut
                # planning, relation-id pre-filters) must not read v2
                # payloads with v1 offsets — lowercase marks them as
                # stream-interior, decided only at stream commit/abort
                am(op.lower() if strm else op)
            elif op == "D":
                pfx = pk_i32(xid) if strm else b""
                if evo:
                    ap(b"D" + pfx + D_MID6[1:] + t_cell(repo) + t_cell(path) + b"nnnn")
                else:
                    ap(b"D" + pfx + D_MIDS[rel][1:] + t_cell(repo) + t_cell(path) + b"nnn")
                am("d" if strm else "D")
            elif op == "T":
                pfx = pk_i32(xid) if strm else b""
                ap(b"T" + pfx + T_PAYLOADS[rel][1:])
                am("t" if strm else "T")
            else:  # pragma: no cover
                raise ValueError(f"bad slot kind={kind!r} op={op!r}")
        yield pd.DataFrame(
            {
                "segment": pdf["segment"].values,
                "lsn": pdf["lsn"].values,
                "mtype": mtypes,
                "payload": payloads,
            }
        )


def spark_frames_df(spark, p: GenParams, n_partitions: int = 0, include_relation: bool = True):
    """Binary WAL frames ``(segment, lsn, mtype, payload)`` for the stream.

    Built as one row per slot (Begin, each op, Commit) via a two-level
    arithmetic explode over ``spark.range(n_segments)``, then Arrow-batched
    encoding in a single ``mapInPandas`` pass. No shuffle anywhere, and —
    like a real WAL receiver's output — the result is **segment-clustered
    and LSN-ordered within every partition** (``spark.range`` splits are
    contiguous segment runs), so the decode stage can skip its co-location
    shuffle (``decode_frames_raw(clustered=True)``).
    """
    from pyspark.sql import functions as F

    ex = event_exprs(p, "spark")
    n_part = n_partitions or spark.sparkContext.defaultParallelism
    n_segments = (p.n_txns + p.txns_per_segment - 1) // p.txns_per_segment
    stride = p.lsn_stride
    ops = p.ops_per_txn

    # segment → txns → slots (slot 0 = Begin/StreamStart, 1..ops = DML,
    # ops+1 = Commit/StreamStop, [streaming: ops+2 = StreamCommit/Abort;
    # interleaved pairs: ops+2 = continuation StreamStart 's', ops+3 =
    # second StreamStop, ops+4 = StreamCommit/Abort]); generated order ==
    # (txn, slot) order — LSN order within a segment after the decode
    # stage's sortWithinPartitions, which interleaved chunk layouts rely
    # on (a pair's frames alternate between the two txns' LSN windows)
    d_spark = _Dialect("spark")
    streamed_e, aborted_e = stream_exprs(p, d_spark, "txn")
    il_e = interleave_exprs(p, d_spark, "txn")
    two_e, two_rb_e = two_phase_exprs(p, d_spark, "txn")
    orig_e = origin_exprs(p, d_spark, "txn")
    originating = p.origin_pct > 0
    twop = p.two_phase_pct > 0
    gap = p.two_phase_gap
    interleaving = p.interleave_streams and p.stream_pct > 0
    composed = twop and p.stream_pct > 0  # streaming=on AND two_phase=on
    if interleaving:
        max_slot = ops + 4
    elif composed:
        max_slot = ops + 3
    elif originating:
        # slot 1 = 'O', DML at 2..ops+1, C / Stream-Stop at ops+2, and
        # — with serial streams composed in — the stream closer at ops+3
        max_slot = ops + 3 if p.stream_pct > 0 else ops + 2
    else:
        max_slot = ops + 2 if p.stream_pct > 0 or twop else ops + 1
    if originating:
        # origin layout (v1 + serial v2 streams, enforced in
        # __post_init__): slot 1 carries the Origin frame for foreign
        # txns ('g'; the encoder adds the in-chunk xid prefix for
        # streamed ones); the DML slots shift by one, matching
        # event_exprs' +2 LSN offset
        kind = (
            f"CASE WHEN slot = 0 THEN (CASE WHEN {streamed_e} THEN 'S' "
            f"ELSE 'B' END) "
            f"WHEN slot = 1 THEN (CASE WHEN {orig_e} THEN 'g' ELSE 'X' END) "
            f"WHEN slot = {ops + 2} THEN (CASE WHEN {streamed_e} THEN 'E' "
            f"ELSE 'C' END) "
        )
        if p.stream_pct > 0:
            kind += (
                f"WHEN slot = {ops + 3} THEN (CASE WHEN {aborted_e} THEN 'A' "
                f"WHEN {streamed_e} THEN 'c' ELSE 'X' END) "
            )
    else:
        kind = (
            f"CASE WHEN slot = 0 THEN (CASE WHEN {streamed_e} THEN 'S' "
            f"WHEN {two_e} THEN 'b' ELSE 'B' END) "
            f"WHEN slot = {ops + 1} THEN (CASE WHEN {streamed_e} THEN 'E' "
            f"WHEN {two_e} THEN 'P' ELSE 'C' END) "
        )
    # the DECISION frame for a prepared txn t lives in the spare slot
    # of window t+gap (its own LSN/segment are overridden below) —
    # no two source txns target the same window, so slots never
    # collide; decisions of the last ``gap`` txns land in windows
    # past n_txns (decision-only trailing segments). In the composed
    # (stream × two-phase) layout slot ops+2 is the stream closer
    # ('p' for prepared streamed txns — the v2 spelling of 'P';
    # 'c'/'A' for plain streamed txns) and the decision moves to the
    # extra slot ops+3, clear of every window's own closer.
    if composed:
        kind += (
            f"WHEN slot = {ops + 2} THEN (CASE "
            f"WHEN {streamed_e} AND {two_e} THEN 'p' "
            f"WHEN {aborted_e} THEN 'A' "
            f"WHEN {streamed_e} THEN 'c' ELSE 'X' END) "
            f"WHEN slot = {ops + 3} THEN (CASE "
            f"WHEN {two_e} AND {two_rb_e} THEN 'r' "
            f"WHEN {two_e} THEN 'K' ELSE 'X' END) "
        )
    elif p.stream_pct > 0 and not originating:
        kind += (
            f"WHEN slot = {ops + 2} THEN (CASE WHEN {il_e} THEN 's' "
            f"WHEN {aborted_e} THEN 'A' "
            f"WHEN {streamed_e} THEN 'c' ELSE 'X' END) "
        )
    elif twop:
        kind += (
            f"WHEN slot = {ops + 2} THEN (CASE "
            f"WHEN {two_e} AND {two_rb_e} THEN 'r' "
            f"WHEN {two_e} THEN 'K' ELSE 'X' END) "
        )
    if interleaving:
        kind += (
            f"WHEN slot = {ops + 3} THEN (CASE WHEN {il_e} THEN 'E' ELSE 'X' END) "
            f"WHEN slot = {ops + 4} THEN (CASE WHEN {il_e} AND {aborted_e} "
            f"THEN 'A' WHEN {il_e} THEN 'c' ELSE 'X' END) "
        )
    kind += "ELSE 'O' END"

    if interleaving:
        h1 = (ops + 1) // 2
        off_p0 = (
            f"CASE WHEN slot = 0 THEN 0 "
            f"WHEN slot <= {ops} THEN (CASE WHEN slot - 1 < {h1} THEN slot "
            f"ELSE {h1 + 4} + slot END) "
            f"WHEN slot = {ops + 1} THEN {h1 + 1} "
            f"WHEN slot = {ops + 2} THEN {2 * h1 + 4} "
            f"WHEN slot = {ops + 3} THEN {h1 + ops + 5} "
            f"ELSE {2 * ops + 8} END"
        )
        off_p1 = (
            f"CASE WHEN slot = 0 THEN {h1 + 2} "
            f"WHEN slot <= {ops} THEN (CASE WHEN slot - 1 < {h1} "
            f"THEN {h1 + 2} + slot ELSE {ops + 6} + slot END) "
            f"WHEN slot = {ops + 1} THEN {2 * h1 + 3} "
            f"WHEN slot = {ops + 2} THEN {h1 + ops + 6} "
            f"WHEN slot = {ops + 3} THEN {2 * ops + 7} "
            f"ELSE {2 * ops + 9} END"
        )
        lsn_sql = (
            f"CAST(CASE WHEN {il_e} THEN 10 + (txn - (txn % 2)) * {stride} "
            f"+ (CASE WHEN txn % 2 = 0 THEN {off_p0} ELSE {off_p1} END) "
            f"ELSE 10 + txn * {stride} + slot END AS BIGINT)"
        )
    elif twop:
        dslot = ops + 3 if composed else ops + 2
        lsn_sql = (
            f"CAST(CASE WHEN slot = {dslot} THEN "
            f"10 + (txn + {gap}) * {stride} + {dslot} "
            f"ELSE 10 + txn * {stride} + slot END AS BIGINT)"
        )
    else:
        lsn_sql = f"CAST(10 + txn * {stride} + slot AS BIGINT)"
    if twop:
        dslot = ops + 3 if composed else ops + 2
        seg_sql = (
            f"CAST(CASE WHEN slot = {dslot} THEN "
            f"(txn + {gap}) DIV {p.txns_per_segment} "
            f"ELSE segment END AS BIGINT)"
        )
        cts_sql = (
            f"CAST(CASE WHEN slot = {dslot} THEN "
            f"(txn + {gap}) * 1000000 + 1 "
            f"ELSE txn * 1000000 END AS BIGINT)"
        )
    else:
        seg_sql = "segment"
        cts_sql = "CAST(txn * 1000000 AS BIGINT)"
    slots = (
        spark.range(0, n_segments, 1, min(n_part, max(1, n_segments)))
        .withColumnRenamed("id", "seg")
        .selectExpr(
            "seg AS segment",
            f"explode(sequence(seg * {p.txns_per_segment}, "
            f"least((seg + 1) * {p.txns_per_segment}, {p.n_txns}) - 1)) AS txn",
        )
        .selectExpr("segment", "txn", f"explode(sequence(0, {max_slot})) AS slot")
        .selectExpr(
            f"{seg_sql} AS segment", "txn", "slot",
            f"{kind} AS kind",
            f"{lsn_sql} AS lsn",
            f"{cts_sql} AS commit_ts_us",
            "CAST(1000 + txn AS BIGINT) AS xid",
            (f"CASE WHEN slot BETWEEN 2 AND {ops + 1} THEN "
             f"txn * {ops} + slot - 2 END AS i" if originating else
             f"CASE WHEN slot BETWEEN 1 AND {ops} THEN "
             f"txn * {ops} + slot - 1 END AS i"),
            f"{streamed_e} AS streamed",
        )
        .filter("kind <> 'X'")
        .selectExpr(
            "segment", "txn", "kind", "lsn", "commit_ts_us", "xid", "streamed",
            f"CASE WHEN kind = 'O' THEN {ex['rel']} ELSE 0 END AS rel",
            f"CASE WHEN kind = 'O' THEN {ex['op']} END AS op",
            f"CASE WHEN kind = 'O' THEN {ex['repo']} END AS repo",
            f"CASE WHEN kind = 'O' THEN {ex['path']} END AS path",
            f"CASE WHEN kind = 'O' THEN {ex['commit']} END AS `commit`",
            f"CASE WHEN kind = 'O' THEN {ex['lang']} END AS lang",
            f"CASE WHEN kind = 'O' THEN {ex['content']} END AS content",
            f"CASE WHEN kind = 'O' THEN {ex['content_unchanged']} ELSE false END AS content_unchanged",
            f"CASE WHEN kind = 'O' THEN {ex['old_repo']} END AS old_repo",
            f"CASE WHEN kind = 'O' THEN {ex['old_path']} END AS old_path",
            f"CASE WHEN kind = 'O' THEN "
            f"{ex.get('stars', 'CAST(NULL AS BIGINT)')} END AS stars",
        )
    )
    frames = slots.mapInPandas(lambda it: _encode_stream_pandas(it, p), schema=FRAMES_SCHEMA)

    if include_relation:
        rel_rows = [
            (
                0,
                1 + r,
                "R",
                bytearray(
                    codec.encode_relation(
                        RELATION_ID + r,
                        RELATION_NAMESPACE,
                        RELATION_NAMES[r] if r < len(RELATION_NAMES) else f"repo_files_{r + 1}",
                        "d",
                        RELATION_COLUMNS,
                    )
                ),
            )
            for r in range(max(1, p.n_relations))
        ]
        if p.evolve_at_txn > 0:
            # the DDL's wire echo: Relation re-sent with the new trailing
            # column, on the spare LSN after txn k-1's commit — every
            # event from txn k on resolves to this version in the
            # LSN-ordered registry
            k = p.evolve_at_txn
            rel_rows.append(
                (
                    (k - 1) // p.txns_per_segment,
                    10 + (k - 1) * p.lsn_stride + p.ops_per_txn + 2,
                    "R",
                    bytearray(
                        codec.encode_relation(
                            RELATION_ID, RELATION_NAMESPACE, RELATION_NAME,
                            "d", EVOLVED_COLUMNS,
                        )
                    ),
                )
            )
        rel = spark.createDataFrame(rel_rows, schema=FRAMES_SCHEMA)
        frames = rel.unionByName(frames)
    return frames


# ---------------------------------------------------------------------------
# DuckDB oracle for the final merged table state
# ---------------------------------------------------------------------------


def _kc_toast_resolution_ctes(p: GenParams, passes: int):
    """CTE chain replaying operators.kc_toast's bounded-pass resolution
    of key-change UPDATEs with unchanged-TOAST content in pure SQL over
    the full stream (no stored fallback — the oracle replays from an
    empty table, so every chain is in-stream). Returns (cte_sql_fragment,
    effective_events_cte_name)."""
    if p.key_change_pct <= 0:
        return "", "eff"
    kc = ("op = 'U' AND old_repo IS NOT NULL AND "
          "(old_repo <> repo OR old_path <> path)")
    ctes = [f"""
pen_0 AS MATERIALIZED (
  SELECT rel, lsn AS p_lsn, old_repo, old_path FROM eff
  WHERE {kc} AND content_unchanged
),
car_0 AS MATERIALIZED (
  SELECT rel AS k_rel, repo AS k_repo, path AS k_path, lsn,
         CASE WHEN op = 'D' THEN NULL ELSE content END AS v,
         (op = 'D' OR NOT content_unchanged) AS has,
         ({kc} AND content_unchanged) AS pend
  FROM eff
  UNION ALL
  SELECT rel, old_repo, old_path, lsn, CAST(NULL AS VARCHAR), true, false
  FROM eff WHERE {kc}
)"""]
    for i in range(1, passes + 1):
        j = i - 1
        ctes.append(f"""
win_{i} AS MATERIALIZED (
  SELECT p.p_lsn,
         max_by({{'v': c.v, 'pend': c.pend}}, c.lsn)
           FILTER (WHERE c.has OR c.pend) AS w
  FROM pen_{j} p LEFT JOIN car_{j} c
    ON c.k_rel = p.rel AND c.k_repo = p.old_repo AND c.k_path = p.old_path
   AND c.lsn < p.p_lsn
  GROUP BY p.p_lsn
),
res_{i} AS MATERIALIZED (
  SELECT p_lsn, w.v AS rv, (w IS NULL OR NOT w.pend) AS done FROM win_{i}
),
pen_{i} AS MATERIALIZED (
  SELECT p.* FROM pen_{j} p JOIN res_{i} r ON p.p_lsn = r.p_lsn WHERE NOT r.done
),
car_{i} AS MATERIALIZED (
  SELECT c.k_rel, c.k_repo, c.k_path, c.lsn,
         CASE WHEN r.p_lsn IS NOT NULL AND c.pend THEN r.rv ELSE c.v END AS v,
         (c.has OR (r.p_lsn IS NOT NULL AND c.pend)) AS has,
         (c.pend AND r.p_lsn IS NULL) AS pend
  FROM car_{j} c
  LEFT JOIN (SELECT p_lsn, rv FROM res_{i} WHERE done) r ON c.lsn = r.p_lsn
)""")
    fx_union = "\n  UNION ALL ".join(
        f"SELECT p_lsn, rv FROM res_{i} WHERE done" for i in range(1, passes + 1)
    )
    ctes.append(f"""
fx AS MATERIALIZED ({fx_union}),
eff_fx AS MATERIALIZED (
  SELECT eff.rel, eff.lsn, eff.op, eff.repo, eff.path, eff."commit", eff.lang,
         CASE WHEN f.p_lsn IS NOT NULL THEN f.rv ELSE eff.content END AS content,
         (eff.content_unchanged AND f.p_lsn IS NULL) AS content_unchanged,
         eff.old_repo, eff.old_path
  FROM eff LEFT JOIN fx f ON eff.lsn = f.p_lsn
)""")
    return ",".join(ctes) + ",", "eff_fx"


def duckdb_final_state_sql(
    p: GenParams, with_sha: bool = True, with_relation: bool = False,
    kc_toast_passes: int = 8, filter_foreign_origins: bool = False,
    until_txn: Optional[int] = None,
) -> str:
    """DuckDB SQL computing the expected final table state after replaying
    the full stream with serial reference semantics (apply each event in
    LSN order: I/U upsert, D delete, T truncate, TOAST-'u' preserves the
    current value).

    Distributed-engine equivalence (what our Spark pipeline implements):
      - truncate barrier: only events after the last T matter;
      - LWW: the max-LSN event per (repo, path) decides presence;
      - TOAST resolution: content = value of the max-LSN event that
        *carries* content information — a non-'u' I/U (its own content)
        or a D (an explicit reset to NULL: a toast-'u' update applied
        after an in-batch delete re-creates the row with unknown/NULL
        content under serial relaxed-upsert semantics; it must NOT
        resurrect the pre-delete value).
    Expressed with max_by(...) FILTER(...) — the same aggregate shape the
    Spark side uses (partial map-side combine, skew-resistant).
    """
    events = duckdb_events_sql(p)
    if until_txn is not None:
        # as-of replay: only transactions committed by the cut (an
        # epoch / batch boundary falls on a whole-transaction edge for
        # serial B..C spans, so txn < cut ≡ commit_lsn ≤ the boundary's
        # watermark). Composes with plain spans only — streamed / 2PC
        # grammars commit later than their DML and would need the
        # decision LSN, not the txn index.
        if p.stream_pct > 0 or p.two_phase_pct > 0:
            raise ValueError(
                "until_txn caps by txn index, exact only for plain "
                "B..C spans (stream_pct = two_phase_pct = 0)"
            )
        events = f"SELECT * FROM ({events}) WHERE txn < {until_txn}"
    sha = ", sha256(content) AS content_sha" if with_sha else ""
    rel_out = f"{RELATION_ID} + rel AS relation_id, " if with_relation else ""
    kc_ctes, eff_name = _kc_toast_resolution_ctes(p, kc_toast_passes)
    # schema evolution: the evolved column is a plain (non-TOASTable)
    # value column — same LWW rule as lang; rows last written before the
    # boundary read NULL (the merge aligns old rows with NULL)
    evolving = p.evolve_at_txn > 0
    ev_stars = ", stars" if evolving else ""
    ev_stars_null = ", CAST(NULL AS BIGINT) AS stars" if evolving else ""
    ev_stars_agg = (
        ",\n    max_by({'v': stars}, lsn) FILTER (WHERE op <> 'D') AS stars_s"
        if evolving else ""
    )
    ev_stars_out = ", stars_s.v AS stars" if evolving else ""
    # aborted streamed transactions (protocol v2) and rolled-back
    # PREPARED transactions (two-phase) never committed — their events
    # must not exist for any purpose, truncate cuts included
    excl = []
    if p.stream_pct > 0 or p.two_phase_pct > 0:
        excl.append("aborted")
    if filter_foreign_origins and p.origin_pct > 0:
        # the engine ingests with skip_foreign_origins: foreign txns'
        # events vanish exactly like aborted streams'
        excl.append("origin_foreign")
    ab = (" AND NOT (" + " OR ".join("ev." + c for c in excl) + ")") \
        if excl else ""
    ab_cut = (" WHERE NOT (" + " OR ".join(excl) + ")") if excl else ""
    return f"""
WITH ev AS ({events}),
cut AS (SELECT rel, coalesce(max(lsn), -1) AS tlsn
        FROM (SELECT * FROM ev{ab_cut}) WHERE op = 'T' GROUP BY rel),
eff AS MATERIALIZED (
  SELECT ev.* FROM ev LEFT JOIN cut ON ev.rel = cut.rel
  WHERE ev.lsn > coalesce(cut.tlsn, -1) AND ev.op <> 'T'{ab}
),{kc_ctes}
-- a key-change U replays as DELETE(old key) + upsert(new key)
eff2 AS (
  SELECT rel, lsn, op, repo, path, "commit", lang, content, content_unchanged{ev_stars} FROM {eff_name}
  UNION ALL
  SELECT rel, lsn, 'D' AS op, old_repo AS repo, old_path AS path,
    CAST(NULL AS VARCHAR) AS "commit", CAST(NULL AS VARCHAR) AS lang,
    CAST(NULL AS VARCHAR) AS content, false AS content_unchanged{ev_stars_null}
  FROM {eff_name}
  WHERE old_repo IS NOT NULL AND (old_repo <> repo OR old_path <> path)
),
lww AS (
  SELECT rel, repo, path,
    max_by(op, lsn) AS final_op,
    max_by({{'v': "commit"}}, lsn) FILTER (WHERE op <> 'D') AS commit_s,
    max_by({{'v': lang}}, lsn) FILTER (WHERE op <> 'D') AS lang_s,
    max_by({{'v': CASE WHEN op = 'D' THEN NULL ELSE content END}}, lsn)
      FILTER (WHERE op = 'D' OR NOT content_unchanged) AS content_s{ev_stars_agg}
  FROM eff2
  GROUP BY rel, repo, path
)
SELECT {rel_out}repo, path, commit_s.v AS "commit", lang_s.v AS lang, content_s.v AS content{ev_stars_out}{sha}
FROM lww
WHERE final_op <> 'D'
""".strip()
