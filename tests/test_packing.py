"""Sequence packing: distributed prefix-sum vs a serial reference,
edge cases (empty docs, id gaps, exact boundaries, tiny inputs)."""

import numpy as np
import pyarrow as pa
import pytest

from raybm25.analysis import tokenize
from raybm25.extras.packing import pack_sequences


def _ref(rows, seq_len):
    out = []
    start = 0
    for did, text in sorted(rows):
        n = len(tokenize(text))
        last = start + max(n, 1) - 1
        out.append((did, n, start, start // seq_len, last // seq_len))
        start += n
    return out


def _run(rows, seq_len, **kw):
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "d.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": [d for d, _ in rows],
                    "text": [t for _, t in rows],
                }
            ),
            p,
        )
        df = pack_sequences(p, seq_len, **kw).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    return list(df.itertuples(index=False, name=None))


def test_matches_serial_reference(ray_session):
    rng = np.random.default_rng(5)
    rows = [
        (int(i), " ".join(f"w{j}" for j in range(rng.integers(0, 40))))
        for i in rng.permutation(200)
    ]
    assert _run(rows, 16) == _ref(rows, 16)


def test_empty_docs_and_id_gaps(ray_session):
    rows = [(0, "a b c"), (7, ""), (9, "d e"), (1000, "f")]
    got = _run(rows, 4)
    assert got == _ref(rows, 4)
    # the empty doc occupies no tokens but pins to its offset's seq
    empty = [r for r in got if r[0] == 7][0]
    assert empty[1] == 0 and empty[2] == 3 and empty[3] == empty[4] == 0


def test_exact_boundary(ray_session):
    # doc of exactly seq_len tokens fills sequence 0 and the next doc
    # starts sequence 1
    rows = [(0, " ".join(["x"] * 8)), (1, "y z")]
    got = _run(rows, 8)
    assert got[0][3:] == (0, 0)
    assert got[1][2:] == (8, 1, 1)


def test_single_doc_and_n_ranges_clamp(ray_session):
    rows = [(42, "only one doc here")]
    assert _run(rows, 2, n_ranges=64) == _ref(rows, 2)


def test_dataset_input_and_bad_seq_len(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"doc_id": [2, 0, 1], "text": ["a b", "c", "d e f"]})
    )
    # id order: doc0 "c" (1 tok), doc1 "d e f" (3), doc2 "a b" (2)
    got = pack_sequences(ds, 2).to_pandas().sort_values("doc_id")
    assert got["start_tok"].tolist() == [0, 1, 4]
    assert got["seq_first"].tolist() == [0, 0, 2]
    with pytest.raises(ValueError):
        pack_sequences(ds, 0)
