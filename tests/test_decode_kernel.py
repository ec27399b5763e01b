"""Pure-Python tests of the decode kernel (no Spark session needed)."""

from __future__ import annotations

import pandas as pd
import pytest

from pypgoutput_spark.operators.decode import _make_kernel
from pypgoutput_spark.wal import codec

PLAIN = {777: [(1, 0, ("id", "val"), (1, 0))]}


def _run(payloads, strict=True, lsns=None):
    pdf = pd.DataFrame(
        {
            "segment": [0] * len(payloads),
            "lsn": lsns or list(range(10, 10 + len(payloads))),
            "payload": payloads,
        }
    )
    out = list(_make_kernel(PLAIN, strict)(iter([pdf])))
    return pd.concat(out) if out else pd.DataFrame()


def test_kernel_happy_path_tx_stamping():
    frames = [
        codec.encode_begin(10, 5_000_000, 99),
        codec.encode_insert(777, [("t", "1"), ("t", "a")]),
        codec.encode_update(777, [("t", "1"), ("u", None)]),
        codec.encode_delete(777, [("t", "1"), ("n", None)]),
        codec.encode_commit(14, 15, 5_000_000),
    ]
    df = _run(frames)
    assert df["op"].tolist() == ["I", "U", "D"]
    assert df["xid"].tolist() == [99, 99, 99]
    assert df["begin_lsn"].tolist() == [10, 10, 10]
    # TOAST-'u' bitmask: cell 1 of the update is unchanged → bit 1 set
    assert df["new_u_mask"].tolist()[:2] == [0, 2]
    assert df["before_kind"].tolist() == [None, None, "K"]
    assert df["error"].isna().all()


def test_kernel_strict_raises_on_corrupt_frame():
    with pytest.raises(Exception):
        _run([b"I\x00\x00\x03\x09N\x00\x02t\x00\x00\x00"])  # truncated


def test_kernel_dead_letters_when_not_strict():
    good = codec.encode_insert(777, [("t", "1"), ("t", "a")])
    corrupt = b"I\x00\x00\x03\x09N\x00\x02t\x00\x00\x00"  # truncated mid-cell
    unknown = b"Z\x01\x02"
    df = _run([codec.encode_begin(10, 0, 1), good, corrupt, unknown], strict=False)
    assert df["op"].tolist() == ["I", "E", "E"]
    errs = df[df["op"] == "E"]["error"].tolist()
    assert all(e for e in errs)
    # good row unaffected, carries its transaction
    assert df.iloc[0]["xid"] == 1


def test_kernel_unknown_relation():
    ins = codec.encode_insert(555, [("t", "1")])  # 555 not in registry
    with pytest.raises(ValueError, match="no Relation message"):
        _run([ins], strict=True)
    df = _run([ins], strict=False)
    assert len(df) == 0  # skipped, reference-like (schema unknown → cannot map)


def test_kernel_truncate_fanout():
    t = codec.encode_truncate([777, 777], 1)
    df = _run([codec.encode_begin(10, 0, 7), t])
    assert df["op"].tolist() == ["T", "T"]
    assert df["relation_id"].tolist() == [777, 777]
    assert df["xid"].tolist() == [7, 7]
