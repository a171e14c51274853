"""Build the N-x scale corpora used by BASELINE.md's scale-up tables.

Two modes:

**copy** (default, rounds 3-6): N copies of every base table with all
entity-key columns shifted by copy*OFFSET so joins stay consistent and
every copy is a disjoint key universe. Text/embedding payloads repeat
verbatim — the ADVERSARIAL case for dedup/df operators (every
shingle/vector's frequency multiplies by N, stressing bucket caps and
df pruning) but an UNDERSTATEMENT of unique-data growth for everything
else.

**generate** (round 7, VERDICT r06 #2): the real-growth lane. Keys
shift exactly as in copy mode (join topology and fact-table growth are
identical), but the payloads that drive dedup / similarity / text
analytics are REGENERATED deterministically per copy instead of
repeated:

- ``documents.text``: copy 0 is the base corpus verbatim; copy i>0
  re-draws each document's words from ITS OWN base document's word
  multiset (80%) blended with the global unigram vocabulary (20%),
  with a seeded per-copy RNG, preserving per-document length, the
  global unigram weights, AND per-document topical identity. Each
  base doc therefore seeds a bounded ~N-member bag-of-words family
  (the constant near-dup rate of real corpus growth) instead of
  either pathology: verbatim copies (every fingerprint ×N) or
  global-vocab resampling (a single-topic corpus where every doc
  pair is SimHash-near — measured round 7: that variant made the
  near-dup graph a 50k-clique and q_triangle_count 43x). Word order
  is freshly random, so sequence-shingle detectors (n-gram Jaccard /
  MinHash) correctly see these as DISTINCT texts while bag-of-words
  detectors (SimHash) see bounded families — different detectors,
  different structure, all real.
- ``embeddings.embedding``: copy i>0 perturbs the base vector with
  seeded N(0, 0.15) noise — new unique points that keep the label
  cluster geometry, so kNN/ANN recall stays meaningful while no
  vector is a verbatim duplicate.

Everything else (tpch tables, events) is identical between modes:
their queried columns are keys/amounts/dates whose verbatim repetition
under a shifted key universe IS real growth (more orders with the same
price distribution).

Usage: python tools/build_scale_corpus.py [N] [base_dir] [out_dir] [--generate]
           [--seed-base M]
Defaults: 5 /root/testdata/sf0.1 /tmp/<base>x<N>[u]

``--seed-base M`` (generate mode; default 0) offsets every per-copy
RNG seed by M, producing a STRUCTURALLY INDEPENDENT regeneration of
the same growth model — the guard against decade tables accidentally
keying on one seed's specific near-dup/noise realization (VERDICT r11
stretch (c)). Two corpora from different seed bases share the key
topology and per-document length/topic profile but no sampled word
order or embedding noise.
"""

from __future__ import annotations

import os
import sys

import duckdb

OFFSET = 10_000_000

# per-table entity-key columns to shift (FKs shift with their PKs)
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _copy_table(con, t: str, keys: list[str], n: int, base: str, out: str) -> None:
    parts = []
    cols = con.sql(f"SELECT * FROM '{base}/{t}.parquet' LIMIT 0").columns
    for i in range(n):
        proj = ", ".join(
            f"{c} + {i * OFFSET} AS {c}" if c in keys else c for c in cols
        )
        parts.append(f"SELECT {proj} FROM '{base}/{t}.parquet'")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
    )


def _generate_documents(n: int, base: str, out: str, seed_base: int = 0) -> None:
    # Each copy is written as its own parquet row group the moment it
    # is generated (ADVICE r07): peak memory is ONE copy + the base,
    # not all N concatenated — at the 100x lane the old pd.concat
    # held ~2.3 GB of frames in the builder itself.
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.read_parquet(f"{base}/documents.parquet")
    words = pd.Series(" ".join(df["text"]).split())
    vocab = words.value_counts()
    toks, weights = vocab.index.to_numpy(), (vocab / vocab.sum()).to_numpy()
    own = [np.asarray(t.split()) for t in df["text"]]
    schema = pa.Table.from_pandas(df, preserve_index=False).schema
    with pq.ParquetWriter(f"{out}/documents.parquet", schema) as w:
        w.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False))
        for i in range(1, n):
            rng = np.random.default_rng(42_000 + seed_base + i)
            texts = []
            for ws in own:
                ln = len(ws)
                draw = ws[rng.integers(0, ln, size=ln)]
                swap = rng.random(ln) < 0.2
                if swap.any():
                    draw = draw.copy()
                    draw[swap] = rng.choice(toks, size=int(swap.sum()), p=weights)
                texts.append(" ".join(draw))
            c = df.copy()
            c["doc_id"] = c["doc_id"] + i * OFFSET
            c["text"] = texts
            c["n_chars"] = [len(t) for t in texts]
            w.write_table(pa.Table.from_pandas(c, schema=schema, preserve_index=False))


def _generate_embeddings(n: int, base: str, out: str, seed_base: int = 0) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.read_parquet(f"{base}/embeddings.parquet")
    mat = np.stack(df["embedding"].to_numpy()).astype("float32")
    schema = pa.Table.from_pandas(df, preserve_index=False).schema
    with pq.ParquetWriter(f"{out}/embeddings.parquet", schema) as w:
        w.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False))
        for i in range(1, n):
            rng = np.random.default_rng(7_000 + seed_base + i)
            pert = mat + rng.normal(0.0, 0.15, size=mat.shape).astype("float32")
            c = df.copy()
            c["vec_id"] = c["vec_id"] + i * OFFSET
            c["embedding"] = list(pert)
            w.write_table(pa.Table.from_pandas(c, schema=schema, preserve_index=False))


def main() -> None:
    argv = sys.argv[1:]
    seed_base = 0
    if "--seed-base" in argv:
        k = argv.index("--seed-base")
        seed_base = int(argv[k + 1])
        argv = argv[:k] + argv[k + 2 :]
    args = [a for a in argv if a != "--generate"]
    generate = "--generate" in argv
    n = int(args[0]) if len(args) > 0 else 5
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    suffix = "u" if generate else ""
    out = args[2] if len(args) > 2 else f"/tmp/{os.path.basename(base)}x{n}{suffix}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEYS.items():
        if generate and t == "documents":
            _generate_documents(n, base, out, seed_base)
        elif generate and t == "embeddings":
            _generate_embeddings(n, base, out, seed_base)
        else:
            _copy_table(con, t, keys, n, base, out)
        rows = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {rows} rows -> {out}/{t}.parquet", flush=True)


if __name__ == "__main__":
    main()
