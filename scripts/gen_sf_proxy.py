"""Generate a driver-scale PROXY dataset by replicating sf0.1 ×N.

The driver's round-end measurement runs at a driver-generated sf (1.0 in
round 5: ~50k docs / ~20k embeddings vs sf0.1's 5k/2k). That data is not
available locally, so scale-sensitive optimizations (jaccard_pairs' pair
blowup, embedding_dup_pairs' quadratic GEMM) are measured on this proxy:

- documents: N copies, doc_id offset per copy, text unchanged — shingle
  doc-frequencies scale ×N exactly as a same-generator ×N corpus would.
- embeddings: N copies, vec_id offset per copy, copies >0 perturbed with
  small deterministic noise so LSH/IVF occupancy scales like a real corpus
  instead of collapsing into exact-duplicate buckets.

Usage: python scripts/gen_sf_proxy.py [N] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "bench", f"sfproxy_x{n}",
    )
    os.makedirs(out, exist_ok=True)

    d = pq.read_table(os.path.join(SRC, "documents.parquet"))
    nd = d.num_rows
    doc_id = d.column("doc_id").to_numpy()
    parts = []
    for c in range(n):
        t = d.set_column(0, "doc_id", pa.array(doc_id + c * nd, type=pa.int64()))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(out, "documents.parquet"))

    e = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    ne = e.num_rows
    vec_id = e.column("vec_id").to_numpy()
    emb = np.stack([np.asarray(x) for x in e.column("embedding").to_pylist()])
    label = e.column("label")
    parts = []
    rng = np.random.default_rng(7)
    for c in range(n):
        m = emb.copy()
        if c:
            m = m + rng.standard_normal(m.shape).astype(m.dtype) * 0.05 * np.abs(m).mean()
        t = pa.table({
            "vec_id": pa.array(vec_id + c * ne, type=pa.int64()),
            "embedding": pa.array(list(m), type=e.schema.field("embedding").type),
            "label": label,
        })
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), os.path.join(out, "embeddings.parquet"))
    print(f"wrote {out}: documents ×{n} ({nd * n} rows), embeddings ×{n} ({ne * n} rows)")


if __name__ == "__main__":
    main()
