"""Focused tests for the input-sized stateful-stream partition rule
(r13 optimization round): stateful streaming exchanges get no AQE
coalescing and freeze their partition count into the checkpoint, so
streaming/structured.py::stateful_stream_partitions derives the count
from input bytes — clamped to the session setting so cluster-scale
inputs keep the cluster-sized knob."""

import os

import pytest

from codd_spark.streaming.structured import (
    local_input_bytes,
    stateful_stream_partitions,
)


class _FakeConf:
    def __init__(self, partitions="64"):
        self._c = {"spark.sql.shuffle.partitions": partitions}

    def get(self, k):
        return self._c[k]

    def set(self, k, v):
        self._c[k] = v


class _FakeSpark:
    def __init__(self, partitions="64"):
        self.conf = _FakeConf(partitions)


def test_small_input_scales_down_and_restores():
    spark = _FakeSpark("64")
    with stateful_stream_partitions(spark, 2_000_000) as n:  # 2 MB
        assert n == 1
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "64"


def test_large_input_clamps_to_session_setting():
    spark = _FakeSpark("200")
    # 100 TB / 64 MiB >> 200 -> the cluster-sized session knob wins
    with stateful_stream_partitions(spark, 100 * 1024**4) as n:
        assert n == 200
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "200"


def test_midsize_input_ceil_division():
    spark = _FakeSpark("64")
    target = 64 << 20
    with stateful_stream_partitions(spark, 3 * target + 1) as n:
        assert n == 4


def test_unknown_size_leaves_session_setting_untouched():
    spark = _FakeSpark("64")
    with stateful_stream_partitions(spark, None) as n:
        assert n == 64
        assert spark.conf.get("spark.sql.shuffle.partitions") == "64"


def test_restores_on_error():
    spark = _FakeSpark("64")
    with pytest.raises(RuntimeError):
        with stateful_stream_partitions(spark, 1):
            raise RuntimeError("stream died")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "64"


def test_local_input_bytes_file_and_dir(tmp_path):
    f = tmp_path / "a.bin"
    f.write_bytes(b"x" * 1000)
    sub = tmp_path / "d"
    sub.mkdir()
    (sub / "b.bin").write_bytes(b"y" * 500)
    assert local_input_bytes(str(f)) == 1000
    assert local_input_bytes(str(tmp_path)) == 1500
    assert local_input_bytes(str(f), str(sub)) == 1500
    # file: scheme is still local
    assert local_input_bytes(f"file:{f}") == 1000


def test_local_input_bytes_unknown():
    assert local_input_bytes("hdfs://nn/path") is None
    assert local_input_bytes("/definitely/not/a/path-%s" % os.getpid()) is None
