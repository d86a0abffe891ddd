#!/usr/bin/env python3
"""Reference-style single-node throughput baseline (tooling, like
check_oracle.py — not engine code).

The reference (ntlind/forecastframe) is a single-process pandas library whose
core rollup is `groupby(hierarchy + [datetime]).agg(...)`
(forecastframe/feature_engineering.py:270-300). It publishes no benchmark
numbers, so this script measures that exact operation shape — pandas groupby
over (host, 1-minute bucket) computing the north-rule measures
(count/sum/mean/min/max/p50/p95 of text length + lang nunique) — on the SAME
parquet page table graft.Bench uses, giving the "reference single-node
throughput at the same data scale" comparison point for BASELINE.md.

Usage: python3 tools/ref_bench.py /tmp/graft_bench_pages_8000000
"""
import sys, time
import pandas as pd
import pyarrow.dataset as ds


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_bench_pages_8000000"
    t0 = time.time()
    # columns only (pandas gets the same pruning courtesy as Spark's scan)
    tbl = ds.dataset(path).to_table(columns=["url", "warc_ts", "text", "lang"])
    df = tbl.to_pandas()
    load_s = time.time() - t0
    n = len(df)

    t1 = time.time()
    # hierarchy extraction (reference: plain string grouping columns)
    df["host"] = df["url"].str.extract(r"https://([^/]+)/", expand=False)
    df["bucket"] = df["warc_ts"].dt.floor("min")
    df["text_len"] = df["text"].str.len().astype("float64")
    g = df.groupby(["host", "bucket"], sort=False)
    agg = g["text_len"].agg(["count", "sum", "mean", "min", "max"])
    agg["p50"] = g["text_len"].quantile(0.5)
    agg["p95"] = g["text_len"].quantile(0.95)
    agg["lang_card"] = g["lang"].nunique()
    rollup_s = time.time() - t1

    print({
        "rows": n,
        "groups": len(agg),
        "load_sec": round(load_s, 2),
        "rollup_sec": round(rollup_s, 2),
        "total_sec": round(load_s + rollup_s, 2),
        "pages_per_sec_rollup_only": round(n / rollup_s),
        "pages_per_sec_incl_load": round(n / (load_s + rollup_s)),
    })


if __name__ == "__main__":
    main()
