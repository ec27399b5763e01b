"""Corruption fuzz of the decode kernels (Spark-free, 1000 trials).

The strict=False contract: ANY byte-level corruption of the WAL either
quarantines as op='E' dead-letter rows or raises a LOUD, typed error
(ValueError with guidance / UnsupportedStreamOp) — never an escaping
IndexError/struct.error/KeyError that would kill an executor with no
diagnosis, and never a silent wrong answer on the uncorrupted v1 spine.

Runs the REAL optimistic kernel (decode._make_optimistic_kernel — the
exact function mapInArrow executes) over Arrow batches built from the
Spark-free producer's frames, so 1000 corruption trials cost seconds,
not 1000 Spark jobs."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.sources.receiver import encode_frames_pdf
from pypgoutput_spark.wal import codec
from pypgoutput_spark.wal.generator import GenParams

N_TRIALS = 1000
BATCH_ROWS = 48


def _fixture():
    # interleave_streams: corruption lands inside interleaved chunk
    # pairs too (the full v2 grammar — S/s/E/c/A, xid-prefixed DML);
    # truncate_every: corrupt 'T' frames must raise typed too (a flipped
    # n_rel byte previously escaped codec.decode_message as struct.error)
    p = GenParams(n_txns=12, ops_per_txn=3, toast_pct=20, txns_per_segment=6,
                  stream_pct=50, stream_abort_pct=25, truncate_every=4,
                  interleave_streams=True)
    pdf = encode_frames_pdf(p, include_relation=True)
    pdf = pdf.sort_values(["segment", "lsn"]).reset_index(drop=True)
    plain = {}
    reg = RelationRegistry()
    for _, row in pdf[pdf["mtype"] == "R"].iterrows():
        reg.add_relation(int(row["lsn"]), codec.decode_message(bytes(row["payload"])))
    return pdf, reg.to_plain()


def _corrupt(payloads: list, rng: random.Random) -> list:
    out = list(payloads)
    for _ in range(rng.randint(1, 3)):
        i = rng.randrange(len(out))
        b = bytearray(out[i])
        mode = rng.random()
        if mode < 0.4 and len(b) > 0:           # truncate
            out[i] = bytes(b[: rng.randrange(len(b))])
        elif mode < 0.8 and len(b) > 0:         # flip one byte
            j = rng.randrange(len(b))
            b[j] ^= 1 << rng.randrange(8)
            out[i] = bytes(b)
        else:                                    # replace with noise
            out[i] = bytes(rng.getrandbits(8) for _ in range(rng.randrange(12)))
    return out


def _run_kernel(pdf, payloads, plain):
    tbl = pa.table({
        "segment": pa.array(pdf["segment"].tolist(), pa.int64()),
        "lsn": pa.array(pdf["lsn"].tolist(), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })
    batches = tbl.to_batches(max_chunksize=BATCH_ROWS)
    kernel = decode_op._make_optimistic_kernel(plain)
    return [rb for rb in kernel(iter(batches))]


def test_clean_baseline_decodes(spark_noop=None):
    pdf, plain = _fixture()
    outs = _run_kernel(pdf, [bytes(b) for b in pdf["payload"]], plain)
    rows = sum(rb.num_rows for rb in outs)
    assert rows > 0
    ops = set()
    for rb in outs:
        ops.update(rb.column(rb.schema.get_field_index("op")).to_pylist())
    assert "E" not in ops, "clean stream must not dead-letter"


def test_corruption_never_escapes_typed_errors():
    pdf, plain = _fixture()
    base = [bytes(b) for b in pdf["payload"]]
    rng = random.Random(20260817)
    completed = quarantined = raised = 0
    for _ in range(N_TRIALS):
        payloads = _corrupt(base, rng)
        try:
            outs = _run_kernel(pdf, payloads, plain)
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            # loud, typed, with guidance — the allowed failure mode
            assert str(exc), "typed errors must carry a message"
            raised += 1
            continue
        completed += 1
        for rb in outs:
            ops = rb.column(rb.schema.get_field_index("op")).to_pylist()
            errs = rb.column(rb.schema.get_field_index("error")).to_pylist()
            for op, err in zip(ops, errs):
                assert (op == "E") == (err is not None)
            if "E" in ops:
                quarantined += 1
    # the fuzz must actually exercise both recovery paths
    assert completed > 50, (completed, raised)
    assert raised > 10, (completed, raised)
    assert quarantined > 20, (completed, raised, quarantined)


def test_strict_kernel_corruption_raises_typed_only():
    """The STRICT vectorized kernel's contract under corruption: every
    failure is a typed ValueError with a message (fail-fast, reference
    parity) — never an escaping IndexError from a wavefront gather or a
    header read (round-5 fuzz found 23/600 trials leaking IndexError
    before the bounds guards in _parse_tuples/process_batch)."""
    from pypgoutput_spark.wal import vdecode

    pdf, plain = _fixture()
    base = [bytes(b) for b in pdf["payload"]]
    rng = random.Random(31337)
    ok = raised = 0
    for _ in range(600):
        payloads = _corrupt(base, rng)
        tbl = pa.table({
            "segment": pa.array(pdf["segment"].tolist(), pa.int64()),
            "lsn": pa.array(pdf["lsn"].tolist(), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })
        kernel = vdecode.make_kernel(plain)
        try:
            list(kernel(iter(tbl.to_batches(max_chunksize=BATCH_ROWS))))
            ok += 1
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            assert str(exc)
            raised += 1
        # any other exception type propagates and fails the test
    assert raised > 100 and ok > 50, (ok, raised)


def _strict_run(payloads, plain):
    """Run the strict vectorized kernel over hand-built single-segment frames."""
    from pypgoutput_spark.wal import vdecode

    tbl = pa.table({
        "segment": pa.array([1] * len(payloads), pa.int64()),
        "lsn": pa.array(list(range(10, 10 + len(payloads))), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })
    kernel = vdecode.make_kernel(plain)
    return list(kernel(iter(tbl.to_batches())))


def _plain_registry():
    reg = RelationRegistry()
    rel = codec.encode_relation(99, "public", "t", "d",
                                [(1, "id", 23, -1), (0, "v", 25, -1)])
    reg.add_relation(5, codec.decode_message(rel))
    return reg.to_plain()


def test_corrupt_truncate_nrel_raises_typed():
    """Regression: a flipped n_rel byte in a 'T' frame escaped
    codec.decode_message as struct.error (untyped) — the fuzz fixture
    had truncate_every=0 so 1600 trials never built a T frame."""
    plain = _plain_registry()
    t = bytearray(codec.encode_truncate([99]))
    t[4] = 0xFF  # n_rel: 1 -> 255, relid list overruns the 10-byte frame
    with pytest.raises(ValueError, match="Truncate relation list overruns"):
        _strict_run([bytes(t)], plain)
    # loop kernel, strict mode: same typed failure
    import pandas as pd

    pdf = pd.DataFrame({"segment": [1], "lsn": [10], "payload": [bytes(t)]})
    with pytest.raises(ValueError, match="Truncate relation list overruns"):
        decode_op._loop_decode_pdf(pdf, {}, plain, strict=True)


def test_corrupt_update_old_image_last_cell_raises_typed():
    """Regression: a corrupt 4-byte cell length in the LAST column of an
    Update's old image marched end_o past the buffer and the 'N'-marker
    gather raised a raw numpy IndexError instead of ValueError."""
    plain = _plain_registry()
    u = bytearray(codec.encode_update(
        99, [("t", "1"), ("t", "x")], old_cells=[("t", "1"), ("t", "y")],
        old_kind="K",
    ))
    # old image layout: 'U' rid 'K' ncols=2 | 't' len4 "1" | 't' len4 "y"
    # the SECOND (last) old cell's length starts at offset 1+4+1+2+5+1 = 14
    assert u[14] == ord("t")
    u[15:19] = (0x7FFFFFF0).to_bytes(4, "big")
    with pytest.raises(ValueError, match="Update old-image TupleData overruns"):
        _strict_run([bytes(u)], plain)


def test_short_truncate_frame_raises_typed():
    """A 'T' frame shorter than its fixed header must raise ValueError
    (not struct.error) from the loop kernel in strict mode and from
    codec.decode_message directly."""
    import pandas as pd

    plain = _plain_registry()
    for short in (b"T", b"T\x00", b"T\x00\x00\x00"):
        with pytest.raises(ValueError, match="truncated pgoutput 'T'"):
            codec.decode_message(short)
        pdf = pd.DataFrame({"segment": [1], "lsn": [10], "payload": [short]})
        with pytest.raises(ValueError):
            decode_op._loop_decode_pdf(pdf, {}, plain, strict=True)


def _message_fixture():
    """Single-segment stream dense with 'M' frames: plain-txn
    transactional + non-transactional messages, an in-chunk message in
    a committed stream and one in an aborted stream (test_outbox's
    grammar, here as fuzz prey)."""
    rel = codec.encode_relation(
        99, "public", "t", "d",
        [(1, "k", 25, -1), (0, "v", 25, -1)],
    )
    reg = RelationRegistry()
    reg.add_relation(1, codec.decode_message(rel))
    x1, x2 = 9901, 9902
    ins = codec.encode_insert(99, [("t", "a"), ("t", "b")])
    payloads = [
        rel,
        codec.encode_begin(10, 111000, 700),
        ins,
        codec.encode_logical_message(True, 12, "outbox", b'{"k":1}'),
        codec.encode_logical_message(False, 13, "audit", b"tick"),
        codec.encode_commit(13, 14, 111000),
        codec.encode_logical_message(False, 20, "audit", b"tock"),
        codec.encode_stream_start(x1, True),
        codec.add_stream_xid(ins, x1),
        codec.add_stream_xid(
            codec.encode_logical_message(True, 32, "outbox", b'{"k":2}'), x1),
        codec.encode_stream_stop(),
        codec.encode_stream_commit(x1, 33, 34, 222000),
        codec.encode_stream_start(x2, True),
        codec.add_stream_xid(
            codec.encode_logical_message(True, 41, "outbox", b'{"k":3}'), x2),
        codec.encode_stream_stop(),
        codec.encode_stream_abort(x2),
    ]
    return payloads, reg.to_plain()


def test_message_corruption_never_escapes_typed_errors():
    """Corruption landing on 'M' frames (truncated header, broken nul,
    overrunning length, non-UTF-8 content, flipped type byte) obeys the
    same contract as DML corruption on BOTH kernels: quarantine or a
    typed ValueError/UnsupportedStreamOp — never an escaping
    IndexError/struct.error/UnicodeDecodeError-as-crash."""
    import pandas as pd

    payloads, plain = _message_fixture()
    pdf = pd.DataFrame({
        "segment": [1] * len(payloads),
        "lsn": list(range(10, 10 + len(payloads))),
    })
    rng = random.Random(20260818)
    opt_done = opt_raised = strict_raised = 0
    for t in range(300):
        corrupted = _corrupt(payloads, rng)
        try:
            outs = _run_kernel(pdf, corrupted, plain)
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            assert str(exc)
            opt_raised += 1
        else:
            opt_done += 1
            for rb in outs:
                ops = rb.column(rb.schema.get_field_index("op")).to_pylist()
                errs = rb.column(rb.schema.get_field_index("error")).to_pylist()
                for op, err in zip(ops, errs):
                    assert (op == "E") == (err is not None)
        try:
            _strict_run(corrupted, plain)
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            assert str(exc)
            strict_raised += 1
        # any other exception type propagates and fails the test
    assert opt_done > 30 and opt_raised > 30, (opt_done, opt_raised)
    assert strict_raised > 100, strict_raised


def _fixture_2pc():
    """Composed grammar corpus: v1 txns, v2 streams (c/A), plain
    prepared (b..P + K/x decisions) and 'p'-sealed streamed-prepared
    txns all in one WAL — corruption must land on two-phase control
    frames and Stream Prepare headers too."""
    p = GenParams(n_txns=16, ops_per_txn=3, toast_pct=20, txns_per_segment=8,
                  stream_pct=50, stream_abort_pct=25,
                  two_phase_pct=40, two_phase_rollback_pct=30,
                  two_phase_gap=3)
    pdf = encode_frames_pdf(p, include_relation=True)
    pdf = pdf.sort_values(["segment", "lsn"]).reset_index(drop=True)
    reg = RelationRegistry()
    for _, row in pdf[pdf["mtype"] == "R"].iterrows():
        reg.add_relation(int(row["lsn"]), codec.decode_message(bytes(row["payload"])))
    return pdf, reg.to_plain()


def test_composed_two_phase_corruption_never_escapes():
    """The streamed-two-phase grammar under byte corruption: the
    optimistic kernel quarantines or raises TYPED errors only; the
    strict vectorized kernel fail-fasts typed only (the class of bug
    this fuzz catches: a seal/abort cohort indexing an empty
    first-chunk table was an IndexError until session 9's guard)."""
    from pypgoutput_spark.wal import vdecode

    pdf, plain = _fixture_2pc()
    base = [bytes(b) for b in pdf["payload"]]
    assert any(b[:1] == b"p" for b in base), "fixture must carry 'p' frames"
    rng = random.Random(20260819)
    completed = raised = 0
    for _ in range(600):
        payloads = _corrupt(base, rng)
        try:
            outs = _run_kernel(pdf, payloads, plain)
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            assert str(exc)
            raised += 1
            continue
        completed += 1
        for rb in outs:
            ops = rb.column(rb.schema.get_field_index("op")).to_pylist()
            errs = rb.column(rb.schema.get_field_index("error")).to_pylist()
            for op, err in zip(ops, errs):
                assert (op == "E") == (err is not None)
    assert completed > 30 and raised > 10, (completed, raised)
    s_ok = s_raised = 0
    for _ in range(400):
        payloads = _corrupt(base, rng)
        tbl = pa.table({
            "segment": pa.array(pdf["segment"].tolist(), pa.int64()),
            "lsn": pa.array(pdf["lsn"].tolist(), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })
        kernel = vdecode.make_kernel(plain)
        try:
            list(kernel(iter(tbl.to_batches(max_chunksize=BATCH_ROWS))))
            s_ok += 1
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            assert str(exc)
            s_raised += 1
    assert s_raised > 50, (s_ok, s_raised)


def _fixture_origin():
    """Origin-bearing corpus: v1 foreign spans (top-level 'O'), foreign
    v2 streams (in-chunk xid-prefixed 'O'), v4-form aborts — corruption
    must land on Origin bodies and the filter machinery must stay typed
    under skip_foreign_origins."""
    p = GenParams(n_txns=16, ops_per_txn=3, toast_pct=20, txns_per_segment=8,
                  origin_pct=50, stream_pct=40, stream_abort_pct=25,
                  abort_v4=True)
    pdf = encode_frames_pdf(p, include_relation=True)
    pdf = pdf.sort_values(["segment", "lsn"]).reset_index(drop=True)
    reg = RelationRegistry()
    for _, row in pdf[pdf["mtype"] == "R"].iterrows():
        reg.add_relation(int(row["lsn"]), codec.decode_message(bytes(row["payload"])))
    return pdf, reg.to_plain()


def test_origin_grammar_corruption_never_escapes():
    """Byte corruption over the origin grammar with filtering ON: the
    optimistic kernel quarantines or raises typed only; the strict
    vectorized kernel fail-fasts typed only. A clean replay through the
    filtering kernel stays the baseline (foreign events absent, no
    quarantine rows)."""
    from pypgoutput_spark.wal import vdecode

    pdf, plain = _fixture_origin()
    base = [bytes(b) for b in pdf["payload"]]
    assert any(b[:1] == b"O" and len(b) > 1 for b in base), "need 'O' bodies"
    assert any(len(b) == 25 and b[:1] == b"A" for b in base), "need v4 aborts"

    # clean baseline through the FILTERING optimistic kernel
    tbl = pa.table({
        "segment": pa.array(pdf["segment"].tolist(), pa.int64()),
        "lsn": pa.array(pdf["lsn"].tolist(), pa.int64()),
        "payload": pa.array(base, pa.binary()),
    })
    kernel = decode_op._make_optimistic_kernel(plain, skip_foreign_origins=True)
    outs = list(kernel(iter(tbl.to_batches(max_chunksize=BATCH_ROWS))))
    clean_rows = sum(rb.num_rows for rb in outs)
    assert clean_rows > 0
    for rb in outs:
        errs = rb.column(rb.schema.get_field_index("error")).to_pylist()
        assert not any(errs), "clean stream must not quarantine"

    rng = random.Random(20260820)
    completed = raised = 0
    for _ in range(600):
        payloads = _corrupt(base, rng)
        t = pa.table({
            "segment": pa.array(pdf["segment"].tolist(), pa.int64()),
            "lsn": pa.array(pdf["lsn"].tolist(), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })
        k = decode_op._make_optimistic_kernel(plain, skip_foreign_origins=True)
        try:
            outs = list(k(iter(t.to_batches(max_chunksize=BATCH_ROWS))))
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            assert str(exc)
            raised += 1
            continue
        completed += 1
        for rb in outs:
            ops = rb.column(rb.schema.get_field_index("op")).to_pylist()
            errs = rb.column(rb.schema.get_field_index("error")).to_pylist()
            for op, err in zip(ops, errs):
                assert (op == "E") == (err is not None)
    assert completed > 30 and raised > 10, (completed, raised)

    s_ok = s_raised = 0
    for _ in range(400):
        payloads = _corrupt(base, rng)
        t = pa.table({
            "segment": pa.array(pdf["segment"].tolist(), pa.int64()),
            "lsn": pa.array(pdf["lsn"].tolist(), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })
        k = vdecode.make_kernel(plain, skip_foreign_origins=True)
        try:
            list(k(iter(t.to_batches(max_chunksize=BATCH_ROWS))))
            s_ok += 1
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            assert str(exc)
            s_raised += 1
    assert s_raised > 50, (s_ok, s_raised)


def _binary_fixture():
    """Binary-mode typed frames (every value cell 'b' — 12 type oids
    incl. numeric/uuid) from the orders-derived encoder, truncated to a
    fuzz-sized prefix that still ends on a commit."""
    from pypgoutput_spark.operators import binary_cdc as B

    pdf = B.encode_binary_frames("/root/testdata/sf0.001")
    pdf = pdf.sort_values(["segment", "lsn"]).reset_index(drop=True)
    pdf = pdf[pdf["segment"] == 0].reset_index(drop=True)  # one C-closed segment
    reg = RelationRegistry()
    for _, row in pdf[pdf["mtype"] == "R"].iterrows():
        reg.add_relation(int(row["lsn"]), codec.decode_message(bytes(row["payload"])))
    return pdf.head(220), reg.to_plain()


def test_binary_mode_corruption_never_escapes_typed_errors():
    """Corruption fuzz over BINARY-mode frames ('b' cells, PG14+
    binary=on): the optimistic kernel must quarantine or raise typed —
    corrupt widths, bad numeric headers, bad jsonb version bytes and
    truncated cells all route through the same contract as text mode."""
    pdf, plain = _binary_fixture()
    # (the head cut may leave the final B..C open — legal: open spans
    # carry across batch ends, they don't raise)
    base = [bytes(b) for b in pdf["payload"]]
    rng = random.Random(20260819)
    completed = quarantined = raised = 0
    for _ in range(400):
        payloads = _corrupt(base, rng)
        try:
            outs = _run_kernel(pdf, payloads, plain)
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            assert str(exc)
            raised += 1
            continue
        completed += 1
        for rb in outs:
            ops = rb.column(rb.schema.get_field_index("op")).to_pylist()
            errs = rb.column(rb.schema.get_field_index("error")).to_pylist()
            for op, err in zip(ops, errs):
                assert (op == "E") == (err is not None)
            if "E" in ops:
                quarantined += 1
    assert completed > 30, (completed, raised)
    assert quarantined > 20, (completed, raised, quarantined)


def test_binary_mode_strict_corruption_raises_typed_only():
    from pypgoutput_spark.wal import vdecode

    pdf, plain = _binary_fixture()
    base = [bytes(b) for b in pdf["payload"]]
    rng = random.Random(424242)
    ok = raised = 0
    for _ in range(300):
        payloads = _corrupt(base, rng)
        tbl = pa.table({
            "segment": pa.array(pdf["segment"].tolist(), pa.int64()),
            "lsn": pa.array(pdf["lsn"].tolist(), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })
        kernel = vdecode.make_kernel(plain)
        try:
            list(kernel(iter(tbl.to_batches(max_chunksize=BATCH_ROWS))))
            ok += 1
        except (ValueError, codec.UnsupportedStreamOp) as exc:
            assert str(exc)
            raised += 1
    assert raised > 50, (ok, raised)
