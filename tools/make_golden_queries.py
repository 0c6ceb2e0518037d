#!/usr/bin/env python3
"""Pin expected outputs for the fully-deterministic no_oracle queries.

Reads graft.Verify output parquet (run at sf0.001) and freezes rows into
fixtures/golden_queries.json (JSON-lines: one object per result row).
QueriesSmokeSpec replays the queries and asserts exact equality, so a
regression in the pinned hashes (Shingles fingerprint, Lcg hyperplanes,
simhash) fails a test instead of silently changing row counts.

Value formatting (must match the Scala side in QueriesSmokeSpec):
integers verbatim, floating-point as %.4f (all pinned queries round to
4 decimals already).

Usage: python3 tools/make_golden_queries.py /tmp/verify_out
"""
import json
import sys

import duckdb

QUERIES = ["q_dedup_fingerprint", "q_dedup_simhash", "q_dedup_embedding",
           "q_lsh_buckets", "q_dedup_minhash",
           # DuckDB-oracled too; pinned so an oracle-side version change
           # can never silently relax the check
           "q_dedup_groups", "q_chunks",
           # end-to-end near-dedup (signature-deterministic survivor sets)
           "q_dedup_drop", "q_semdedup",
           # fuzzy decontamination (signature-deterministic flags)
           "q_decontaminate_fuzzy",
           # incremental near-dedup survivors (signature-deterministic)
           "q_dedup_inc_near",
           # audio features (deterministic synth WAVs -> deterministic
           # RMS/ZCR/Goertzel values; %.4f-pinned)
           "q_multimodal_audio",
           # image features (deterministic synth PNGs; %.4f-pinned)
           "q_multimodal",
           # composed curation pipeline (quality -> line/span dedup ->
           # near-dedup -> decontaminate -> mix -> chunk; deterministic)
           "q_curate_e2e"]

def fmt(v):
    # bool check must precede everything (bool is an int subclass); the
    # Scala side (QueriesSmokeSpec.fmt) emits 'true'/'false'/'null'
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, float):
        return f"{v:.4f}"
    return str(v)

def main(out_dir):
    con = duckdb.connect()
    with open("fixtures/golden_queries.json", "w") as f:
        for q in QUERIES:
            rel = con.sql(f"SELECT * FROM '{out_dir}/{q}/*.parquet'")
            cols = rel.columns
            rows = sorted(rel.fetchall())
            for r in rows:
                f.write(json.dumps({
                    "query": q,
                    "columns": ",".join(cols),
                    "row": "|".join(fmt(v) for v in r),
                }) + "\n")
            print(f"{q}: {len(rows)} rows, cols={cols}")
    print("wrote fixtures/golden_queries.json")

if __name__ == "__main__":
    main(sys.argv[1])
