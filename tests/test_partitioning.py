"""Split/compression correctness, mirroring the reference's
XmlPartitioningSuite.scala:27-72: forced tiny splits over uncompressed,
gzip, and bzip2 variants must produce exact record counts (no loss, no
duplication at split boundaries), with FAILFAST so malformed reads throw.
"""

import bz2 as _bz2
import os

import pytest

from spark_xml_spark.sources.api import read_xml
from spark_xml_spark.xmlcore import bz2split, tokenizer

RES = "/root/reference/src/test/resources"


@pytest.mark.parametrize("target", [500, 8342, 100000])
def test_uncompressed_forced_splits(target):
    recs = [
        r
        for s in tokenizer.plan_splits(f"{RES}/fias_house.large.xml", "UTF-8", target)
        for r in tokenizer.scan_split(s, "House")
    ]
    # 740 rows = 20 repetitions of 37 distinct houses; the exact count is
    # the no-loss/no-duplication invariant (XmlPartitioningSuite asserts
    # counts the same way)
    assert len(recs) == 740
    assert len(set(recs)) == 37


@pytest.mark.parametrize("target", [500, 8342])
def test_bzip2_forced_splits(target):
    splits = tokenizer.plan_splits(f"{RES}/fias_house.large.xml.bz2", "UTF-8", target)
    assert len(splits) > 1, "bz2 file should be split"
    recs = [r for s in splits for r in tokenizer.scan_split(s, "House")]
    assert len(recs) == 740
    assert len(set(recs)) == 37


def test_gzip_whole_file():
    splits = tokenizer.plan_splits(f"{RES}/fias_house.large.xml.gz", "UTF-8", 500)
    assert len(splits) == 1 and splits[0].whole_file
    recs = [r for s in splits for r in tokenizer.scan_split(s, "House")]
    assert len(recs) == 740


def test_small_fias_files():
    for suffix, tag in [(".xml", "House"), (".xml.gz", "House"), (".xml.bz2", "House")]:
        splits = tokenizer.plan_splits(f"{RES}/fias_house{suffix}", "UTF-8", 500)
        recs = [r for s in splits for r in tokenizer.scan_split(s, tag)]
        assert len(recs) == 37, suffix


def test_bz2_block_scan_exact(tmp_path):
    """The bit-level block scanner finds exactly the true block magics."""
    raw = (b"<r><a>" + b"x" * 50 + b"</a></r>\n") * 20000
    path = str(tmp_path / "t.bz2")
    with open(path, "wb") as fh:
        fh.write(_bz2.compress(raw, 1))
    size = os.path.getsize(path)
    got = bz2split.find_block_bits(path, 0, size)
    data = int.from_bytes(open(path, "rb").read(), "big")
    nbits = size * 8
    truth = [
        bit
        for bit in range(0, nbits - 48 + 1)
        if (data >> (nbits - 48 - bit)) & ((1 << 48) - 1) == bz2split.BLOCK_MAGIC
    ]
    assert got == truth and len(got) >= 2


def test_bz2_multi_block_splits(tmp_path):
    """Multi-block archive: every forced split size yields the exact record
    set (the BYBLOCK ownership invariant)."""
    rows = "".join(f"<r><a>{i}</a></r>\n" for i in range(30000))
    doc = f"<R>\n{rows}</R>\n".encode()
    path = str(tmp_path / "m.bz2")
    with open(path, "wb") as fh:
        fh.write(_bz2.compress(doc, 1))
    expected = 30000
    for target in [4096, 16384, os.path.getsize(path) + 1]:
        splits = tokenizer.plan_splits(path, "UTF-8", target)
        recs = [r for s in splits for r in tokenizer.scan_split(s, "r")]
        assert len(recs) == expected, f"target={target}"
        assert len(set(recs)) == expected


def test_bz2_through_datasource_failfast(spark, tmp_path):
    df = read_xml(
        spark,
        f"{RES}/fias_house.large.xml.bz2",
        rowTag="House",
        mode="FAILFAST",
        targetSplitSize=8342,
    )
    assert df.count() == 740


def test_bz2_multistream_degrades_to_whole_file(tmp_path):
    """pbzip2-style concatenated streams must not be block-split (stream
    boundaries would lose blocks); they read whole-file, exactly."""
    import bz2 as b

    part1 = "".join(f"<r><a>{i}</a></r>" for i in range(5000))
    part2 = "".join(f"<r><a>{i}</a></r>" for i in range(5000, 9000))
    path = str(tmp_path / "ms.bz2")
    with open(path, "wb") as fh:
        fh.write(b.compress(f"<R>{part1}".encode(), 1))
        fh.write(b.compress(f"{part2}</R>".encode(), 1))
    assert bz2split.looks_multistream(path)
    splits = tokenizer.plan_splits(path, "UTF-8", 4096)
    assert len(splits) == 1 and splits[0].whole_file
    recs = [r for s in splits for r in tokenizer.scan_split(s, "r")]
    assert len(recs) == 9000
