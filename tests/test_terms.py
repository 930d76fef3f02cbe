"""Corpus-level duplicated-span census (boilerplate detector)."""

def test_dup_span_census_planted_boilerplate():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.terms import dup_span_census
    from efficient_graph_algorithms_ray.functions.text import hash_token

    boiler = " ".join(f"b{i}" for i in range(8))
    docs = {i: f"u{i}a u{i}b {boiler} u{i}c" for i in range(5)}
    docs[9] = f"{boiler} {boiler}"  # two occurrences in one doc
    docs[10] = "x1 x2 x3"  # too short for w=8 → no windows
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "text": pa.array(list(docs.values()), type=pa.string()),
            }
        )
    )
    out = dup_span_census(ds, w=8, top=3).to_pandas()
    top = out.iloc[0]
    assert top["w_fp"] == np.uint64(hash_token(boiler)).astype(np.int64)
    # 5 single-occurrence docs + doc 9 (the "b0..b7 b0..b7" text has
    # 9 windows, two of which are the boilerplate itself at pos 0, 8)
    assert top["n_occurrences"] == 7
    assert top["n_docs"] == 6
    # everything else is unique → count 1, and the census is capped
    assert len(out) == 3
    assert (out["n_occurrences"].iloc[1:] == 1).all()
