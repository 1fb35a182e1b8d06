"""Synthesize a larger deterministic SF dir for the one-time bigger-scale
correctness sweep (round-4 verdict #6): the driver ships sf0.001/0.01/0.1;
this derives an sf0.3-equivalent dir from sf0.1 with NO external data and no
RNG — every derived row is a pure function of the source rows, so the sweep
stays a Spark-vs-DuckDB comparison on identical parquet.

- documents ×3: copy c remaps doc_id += c·10,000,000 and appends a distinct
  suffix word ("copyone"/"copytwo", ≤8 chars — the corpus word-length
  contract the geometry oracles rest on) so replicated texts are NEAR- but
  not exact duplicates (keeps dedup cardinalities realistic); n_chars is
  recomputed from the new text.
- embeddings ×3: copy c remaps vec_id += c·1,000,000 and ROTATES the vector
  by c positions — rotation decorrelates the copy from its source (identical
  copies would plant 10k artificial cosine-1.0 pairs and swamp the near-dup
  ops), and stays clear of the in-query planted-pair id offset (+500k).
- every other table: hard-linked/copied from sf0.1 unchanged (the relational
  queries are already swept at two SFs; the bigger cardinalities that matter
  here — media store, LSH/IVF bucket occupancy, int64 box-sum paths — come
  from documents/embeddings).

Usage: python tools/make_scaled_sf.py [dst_dir]   (default .sfscale/sf0.3)
Then:  python tools/check_oracle.py --json CORRECTNESS_sf03.json .sfscale/sf0.3
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from api_ocr_spark.sources.tables import TPCH_TABLES  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 3
SUFFIX = {1: "copyone", 2: "copytwo"}  # ≤8 chars each (corpus contract)


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".sfscale", "sf0.3")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    suffix_case = " ".join(
        f"WHEN c.copy = {c} THEN d.text || ' {w}'" for c, w in SUFFIX.items())
    con.execute(f"""
      COPY (
        SELECT d.doc_id + c.copy * 10000000 AS doc_id,
               CASE {suffix_case} ELSE d.text END AS text,
               d.lang, d.source,
               length(CASE {suffix_case} ELSE d.text END) AS n_chars
        FROM read_parquet('{SRC}/documents.parquet') d
        CROSS JOIN (SELECT unnest(range({COPIES})) AS copy) c
        ORDER BY doc_id
      ) TO '{dst}/documents.parquet' (FORMAT parquet)
    """)

    con.execute(f"""
      COPY (
        SELECT e.vec_id + c.copy * 1000000 AS vec_id,
               CASE WHEN c.copy = 0 THEN e.embedding
                    ELSE list_concat(e.embedding[c.copy + 1:],
                                     e.embedding[1:c.copy])
               END::FLOAT[] AS embedding,
               e.label
        FROM read_parquet('{SRC}/embeddings.parquet') e
        CROSS JOIN (SELECT unnest(range({COPIES})) AS copy) c
        ORDER BY vec_id
      ) TO '{dst}/embeddings.parquet' (FORMAT parquet)
    """)

    for t in TPCH_TABLES:
        if t in ("documents", "embeddings"):
            continue
        target = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(target):
            try:
                os.link(os.path.join(SRC, f"{t}.parquet"), target)
            except OSError:
                shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), target)

    n_docs = con.execute(
        f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    n_vecs = con.execute(
        f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    maxw = con.execute(f"""
      SELECT max(length(w)) FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM '{dst}/documents.parquet')""").fetchone()[0]
    assert maxw <= 8, f"corpus word-length contract violated: {maxw}"
    print(f"wrote {dst}: documents={n_docs} embeddings={n_vecs} max_word={maxw}")


if __name__ == "__main__":
    main()
