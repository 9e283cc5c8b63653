"""Doc-id allocation: reference serial-probe parity + distributed sequence
determinism across partition counts."""

import pytest

from search_engine_spark.operators.docids import (
    allocate_reference_ids,
    with_global_sequence,
    with_reference_ids,
)


def simulate_serial(ranks):
    """Direct transliteration of memory-storage.ts:101-106 as ground truth."""
    taken = set()
    out = []
    for rank in ranks:
        i = rank
        while i in taken:
            i -= 1
        if i < 0:
            raise ValueError("Rank <= 0")
        taken.add(i)
        out.append(i)
    return out


@pytest.mark.parametrize(
    "ranks",
    [
        [0, 1],
        [0, 10, 10, 10, 10],  # Rank Haber: 0,10,9,8,7
        [100000, 1000, 10],
        [100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 110, 111, 22, 113, 114, 115],
        [5, 4, 5],  # order-dependence case: 5,4,3
        [5, 5, 4],  # 5,4,3 with different per-doc mapping
        list(range(1, 17)),
        [3, 3, 3, 5, 5, 1],
    ],
)
def test_reference_allocator_matches_serial_probe(ranks):
    assert allocate_reference_ids(ranks) == simulate_serial(ranks)


def test_carl_binary_ranks():
    # engine-binary.test.ts:106-113 — rank = text.rank + i, one rank-10 doc
    ranks = [100 + i for i in range(16)]
    ranks[12] = 10 + 12
    assert allocate_reference_ids(ranks) == simulate_serial(ranks)


def test_allocator_raises_below_zero():
    with pytest.raises(ValueError, match="Rank <= 0"):
        allocate_reference_ids([0, 0])


def test_with_reference_ids(spark):
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate([0, 10, 10, 10, 10])],
        "arrival long, rank long",
    )
    got = {
        r["arrival"]: r["doc_id"]
        for r in with_reference_ids(df, "rank", ["arrival"]).collect()
    }
    assert got == {0: 0, 1: 10, 2: 9, 3: 8, 4: 7}


def test_global_sequence_dense_and_order_stable(spark):
    rows = [(f"c{i % 7}", i // 7) for i in range(300)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    out = with_global_sequence(df, ["conv_id", "turn_idx"], num_partitions=5)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["doc_id"]) for r in out.collect()
    )
    assert [g[2] for g in got] == list(range(1, 301))
    # independent of partition count
    out2 = with_global_sequence(df, ["conv_id", "turn_idx"], num_partitions=13)
    got2 = sorted(
        (r["conv_id"], r["turn_idx"], r["doc_id"]) for r in out2.collect()
    )
    assert got == got2


def test_duplicate_url_rejected(spark, tmp_path):
    """B7 parity: adding a url twice must fail like engine.ts:56-58."""
    import pytest as _pytest

    from search_engine_spark.operators.index_build import build_index

    rows = [
        ("https://x/a", "A", "alpha text", 0, 0),
        ("https://x/a", "A2", "alpha again", 1, 1),
        ("https://x/b", "B", "beta text", 2, 2),
    ]
    df = spark.createDataFrame(
        rows, "url string, title string, text string, rank long, arrival long"
    )
    with _pytest.raises(ValueError, match="already in index"):
        build_index(
            spark, df, str(tmp_path / "dup_idx"), mode="reference",
            segments=1, check_unique_urls=True,
        )
