"""Deterministic cross-engine SQL expression helpers.

Every operator in this repo that claims a DuckDB oracle builds both its
Spark query and its oracle from expressions that evaluate *bit-identically*
in Spark SQL and DuckDB:

  - randomness is derived from md5() (identical hex in both engines),
    converted to non-negative bigints;
  - floating point is avoided except where IEEE-754 guarantees
    determinism (a single widening, multiply, divide, or sqrt of
    identical inputs) — never order-dependent float summation;
  - sums over doubles go through an exact DECIMAL cast first
    (order-free), then back to double.

These helpers are the only place dialect differences live.
"""

from __future__ import annotations


class Dialect:
    def __init__(self, name: str):
        assert name in ("spark", "duckdb"), name
        self.name = name

    # md5-derived non-negative bigint (15 hex chars < 2^60)
    def md5_int(self, expr: str) -> str:
        if self.name == "spark":
            return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
        return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"

    def s(self, expr: str) -> str:
        t = "STRING" if self.name == "spark" else "VARCHAR"
        return f"CAST({expr} AS {t})"

    def idiv(self, a: str, b: str) -> str:
        op = "DIV" if self.name == "spark" else "//"
        return f"({a} {op} {b})"

    # exact order-free sum of a double expression, returned as double
    def exact_sum(self, expr: str, scale: str = "DECIMAL(28,10)") -> str:
        return f"CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE)"

    # array<T> helpers (Spark higher-order fns vs DuckDB list fns)
    def array_filter(self, arr: str, lam: str) -> str:
        fn = "filter" if self.name == "spark" else "list_filter"
        return f"{fn}({arr}, {lam})"

    def array_transform(self, arr: str, lam: str) -> str:
        fn = "transform" if self.name == "spark" else "list_transform"
        return f"{fn}({arr}, {lam})"

    def array_len(self, arr: str) -> str:
        fn = "size" if self.name == "spark" else "len"
        return f"{fn}({arr})"

    def array_min(self, arr: str) -> str:
        fn = "array_min" if self.name == "spark" else "list_min"
        return f"{fn}({arr})"

    def array_contains(self, arr: str, x: str) -> str:
        if self.name == "spark":
            return f"array_contains({arr}, {x})"
        return f"list_contains({arr}, {x})"

    def array_lit(self, items) -> str:
        body = ", ".join(f"'{x}'" for x in items)
        if self.name == "spark":
            return f"array({body})"
        return f"[{body}]"

    def split_ws(self, expr: str) -> str:
        """Non-empty lowercase whitespace tokens."""
        if self.name == "spark":
            return f"filter(split(lower({expr}), '\\\\s+'), x -> x != '')"
        return f"list_filter(regexp_split_to_array(lower({expr}), '\\s+'), x -> x <> '')"

    def regexp_replace_all(self, expr: str, pattern: str, repl: str) -> str:
        """Replace EVERY match (Spark replaces all by default; DuckDB
        needs the 'g' flag). Same escaping rule as regexp_count."""
        if self.name == "spark":
            pat = pattern.replace(chr(92), chr(92) * 2)
            return f"regexp_replace({expr}, '{pat}', '{repl}')"
        return f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"

    def split_lines(self, expr: str) -> str:
        """Non-empty lines (literal newline split, case preserved)."""
        if self.name == "spark":
            return f"filter(split({expr}, '\\n'), x -> x != '')"
        return f"list_filter(string_split({expr}, chr(10)), x -> x <> '')"

    def regexp_count(self, expr: str, pattern: str) -> str:
        # Spark SQL string literals consume backslash escapes; DuckDB doesn't
        if self.name == "spark":
            return f"regexp_count({expr}, '{pattern.replace(chr(92), chr(92) * 2)}')"
        return f"len(regexp_extract_all({expr}, '{pattern}'))"

    def fold(self, arr: str, init: str, lam: str) -> str:
        """Left fold with explicit init."""
        if self.name == "spark":
            return f"aggregate({arr}, {init}, {lam})"
        # DuckDB list_reduce seeds with the first element → prepend init
        return f"list_reduce(list_prepend({init}, {arr}), {lam})"

    def array_get(self, arr: str, i: str) -> str:
        """1-based element access."""
        if self.name == "spark":
            return f"element_at({arr}, {i})"
        return f"{arr}[{i}]"

    def unnest(self, arr: str) -> str:
        fn = "explode" if self.name == "spark" else "unnest"
        return f"{fn}({arr})"

    def array_concat(self, *arrs: str) -> str:
        if self.name == "spark":
            return f"concat({', '.join(arrs)})"
        out = arrs[0]
        for a in arrs[1:]:
            out = f"list_concat({out}, {a})"
        return out

    def array_distinct(self, arr: str) -> str:
        fn = "array_distinct" if self.name == "spark" else "list_distinct"
        return f"{fn}({arr})"

    def xor(self, a: str, b: str) -> str:
        if self.name == "spark":
            return f"({a} ^ {b})"
        return f"xor({a}, {b})"

    def shiftr(self, a: str, b: str) -> str:
        if self.name == "spark":
            return f"shiftright({a}, {b})"
        return f"({a} >> {b})"

    def dot_bigint(self, a: str, b: str, n: int) -> str:
        """Exact integer dot product of two n-element bigint arrays."""
        if self.name == "spark":
            return (
                f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            )
        return (
            f"CAST(list_sum(list_transform(generate_series(1, {n}), "
            f"i -> {a}[i] * {b}[i])) AS BIGINT)"
        )

    def array_agg_ordered(self, val: str, pos: str) -> str:
        """Aggregate ``val`` into an array ordered by ``pos`` — order-
        deterministic in both engines (Spark's collect_list alone is not:
        it keeps arrival order, so sort (pos, val) structs after)."""
        if self.name == "spark":
            return (
                f"transform(array_sort(collect_list(named_struct("
                f"'p', {pos}, 'v', {val}))), s -> s.v)"
            )
        return f"list({val} ORDER BY {pos})"

    def ilog2(self, expr: str) -> str:
        """floor(log2(x)) for integer x >= 1, computed EXACTLY as
        binary-digit count (never float log — libm last-ulp differences
        at power-of-two boundaries would break cross-engine parity)."""
        if self.name == "spark":
            return f"(length(conv(CAST({expr} AS STRING), 10, 2)) - 1)"
        return f"(length(to_base({expr}, 2)) - 1)"

    def sequence(self, lo: str, hi: str) -> str:
        """Inclusive integer sequence as array (empty when hi < lo)."""
        if self.name == "spark":
            return f"CASE WHEN {hi} >= {lo} THEN sequence({lo}, {hi}) ELSE array() END"
        return f"CASE WHEN {hi} >= {lo} THEN generate_series({lo}, {hi}) ELSE [] END"

    def array_slice(self, arr: str, start: str, end: str) -> str:
        """1-based INCLUSIVE slice [start, end] (Spark's slice takes a
        length; DuckDB's list_slice takes inclusive endpoints)."""
        if self.name == "spark":
            return (
                f"slice({arr}, CAST({start} AS INT), "
                f"CAST({end} - ({start}) + 1 AS INT))"
            )
        return f"list_slice({arr}, {start}, {end})"

    def array_join(self, arr: str, sep: str = " ") -> str:
        if self.name == "spark":
            return f"array_join({arr}, '{sep}')"
        return f"array_to_string({arr}, '{sep}')"


SPARK = Dialect("spark")
DUCKDB = Dialect("duckdb")
