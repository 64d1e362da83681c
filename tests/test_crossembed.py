"""cross_corpus_embedding_near_dups: cross-side-only pairs, LSH recall on
near-identical vectors, null handling, and pair orientation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pdf_parser_ray.ops.crossembed import cross_corpus_embedding_near_dups


def _axis(j: int, dim: int = 16, scale: float = 3.0) -> np.ndarray:
    v = np.zeros(dim)
    v[j] = scale
    return v


def _mk(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], pa.list_(pa.float64())
                ),
            }
        )
    )


def test_cross_embedding_near_dups_finds_planted_pairs(ray_session):
    rng = np.random.RandomState(5)
    # train: 5 orthogonal clusters x 4 vectors (orthogonal axes — scalar
    # offsets would make clusters PARALLEL in cosine space)
    train_rows = []
    for i in range(20):
        train_rows.append(
            (100 + i, (_axis(i % 5) + rng.randn(16) * 0.01).tolist())
        )
    # test: near-copies of 6 train vectors (must pair with their source's
    # whole cluster at threshold 0.9) + 2 off-cluster vectors (no pairs)
    test_rows = [
        (j, (np.asarray(train_rows[j][1]) + rng.randn(16) * 1e-3).tolist())
        for j in range(6)
    ]
    test_rows += [(90, _axis(10).tolist()), (91, _axis(11).tolist())]

    out = cross_corpus_embedding_near_dups(
        train=_mk(train_rows), test=_mk(test_rows), threshold=0.9
    ).to_pandas()

    assert list(out.columns) == ["train_id", "test_id", "cosine"]
    assert (out.cosine >= 0.9).all()
    # orientation: train ids on the left, test ids on the right — never mixed
    assert set(out.train_id) <= {100 + i for i in range(20)}
    assert set(out.test_id) <= {0, 1, 2, 3, 4, 5, 90, 91}
    # every planted near-copy found its own source (cosine ~ 1 -> the pair
    # collides in every table; cluster mates at noise 0.01 also qualify)
    found = set(zip(out.train_id, out.test_id))
    for j in range(6):
        assert (100 + j, j) in found
    # the off-cluster test vectors pair with nothing
    assert not (out.test_id.isin([90, 91])).any()
    # no duplicates from multi-table collisions
    assert len(found) == len(out)


def test_cross_embedding_near_dups_drops_nulls(ray_session):
    train = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, None, 3, 4], pa.int64()),
                "embedding": pa.array(
                    [_axis(0).tolist(), _axis(0).tolist(), None, []],
                    pa.list_(pa.float64()),
                ),
            }
        )
    )
    test = _mk([(50, _axis(0).tolist())])
    out = cross_corpus_embedding_near_dups(
        train=train, test=test, threshold=0.5
    ).to_pandas()
    # only the fully-valid train row can pair
    assert set(zip(out.train_id, out.test_id)) == {(1, 50)}
