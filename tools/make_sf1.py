"""Derive a deterministic sf1 (10x sf0.1) table set for the scale-up
correctness spot-check (round-3 review item 6).

The driver ships sf{0.001,0.01,0.1} read-only; sf1 is DERIVED, not
invented: 10 copies of sf0.1, copy k shifted by k * N in every id
column. Document text in copy k > 0 gets every token suffixed `xk`,
which makes copies pairwise DISJOINT in shingle space — so near-dup
pair structure scales exactly linearly (each copy reproduces sf0.1's
internal dup structure, no cross-copy pairs), the honest shape for a
scale test: a quadratic blow-up in any operator shows up as a
super-linear wall, not as an artifact of 10 identical clones.

Everything is pure SQL over the source parquet (no RNG, no
timestamps), so the output is bit-reproducible. TPC-H relational
tables are carried over unscaled — the spot-checked top-10 expensive
queries are all documents-driven; carrying the small tables keeps the
unmodified sweep harness working against this directory.

Usage: python tools/make_sf1.py [outdir]   (default /root/repo/.sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW src_documents AS SELECT * FROM '{SRC}/documents.parquet'")
    con.execute(f"CREATE VIEW src_embeddings AS SELECT * FROM '{SRC}/embeddings.parquet'")
    con.execute(f"CREATE VIEW src_events AS SELECT * FROM '{SRC}/events.parquet'")
    n_docs = con.execute("SELECT COUNT(*) FROM src_documents").fetchone()[0]
    n_vecs = con.execute("SELECT COUNT(*) FROM src_embeddings").fetchone()[0]
    n_evts = con.execute("SELECT COUNT(*) FROM src_events").fetchone()[0]
    n_users = con.execute(
        "SELECT MAX(user_id) + 1 FROM src_events").fetchone()[0]

    con.execute(f"""
    COPY (
      SELECT d.doc_id + k.k * {n_docs} AS doc_id,
             CASE WHEN k.k = 0 THEN d.text
                  ELSE regexp_replace(d.text, '(\\S+)',
                                      '\\1x' || CAST(k.k AS VARCHAR), 'g')
             END AS text,
             d.lang, d.source,
             CAST(length(CASE WHEN k.k = 0 THEN d.text
                  ELSE regexp_replace(d.text, '(\\S+)',
                                      '\\1x' || CAST(k.k AS VARCHAR), 'g')
             END) AS BIGINT) AS n_chars
      FROM src_documents d CROSS JOIN (
        SELECT range AS k FROM range({COPIES})) k
      ORDER BY doc_id
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT e.vec_id + k.k * {n_vecs} AS vec_id, e.embedding, e.label
      FROM src_embeddings e CROSS JOIN (
        SELECT range AS k FROM range({COPIES})) k
      ORDER BY vec_id
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT e.event_id + k.k * {n_evts} AS event_id, e.ts,
             e.user_id + k.k * {n_users} AS user_id,
             e.event_type, e.value, e.props
      FROM src_events e CROSS JOIN (
        SELECT range AS k FROM range({COPIES})) k
      ORDER BY event_id
    ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in ("documents", "embeddings", "events"):
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
