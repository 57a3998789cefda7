#!/usr/bin/env python3
"""Measure the reference pipeline (BASELINE.md).

Generates a tick CSV in the reference's exact input shape from the sf0.1
events table (same 100k-row scale the repo's Bench runs at), then runs the
reference's stage 2 (aggregator_candles.py) and stage 3 (candle_to_calcs.py,
batch) unmodified, timing each stage. Stage 3 runs with PYTHONPATH pointing
at shims/ because the container has no TA-Lib/SciPy (see shims/talib.py for
why the timing stays representative).

Usage: python3 scripts/baseline/run_baseline.py [sf_dir]
Writes: target/baseline/results.json (consumed when authoring BASELINE.md)
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[2]
REF = Path("/root/reference/src")
BASE = REPO / "target" / "baseline"
DATA = BASE / "data"
WORK = BASE / "work"  # cwd for the reference scripts; they write to ../data
SHIMS = Path(__file__).resolve().parent / "shims"


def gen_ticks(sf_dir: str) -> dict:
    """events.parquet -> historical_tick_data_3.csv in the reference's format.

    Mapping mirrors graft.core.Tables.ticks (price=value, volume=user_id+1,
    ts ns->us), except all rows carry symbol NVDA: the reference pipeline is
    single-symbol by construction (aggregator_candles.py:465 hardcodes NVDA),
    so the fair single-node comparison gives it all 100k ticks under its one
    symbol — identical total row count to the repo's sf0.1 bench input.
    """
    t0 = time.time()
    tab = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts", "value", "user_id"])
    df = tab.to_pandas()
    df = df.sort_values("ts").reset_index(drop=True)
    ts = df["ts"].dt.floor("us")
    out = DATA / "historical_tick_data_3.csv"
    import pandas as pd
    pd.DataFrame({
        "symbol": "NVDA",
        "timestamp": ts.dt.strftime("%Y-%m-%d %H:%M:%S.%f") + " UTC",
        "price": df["value"],
        "volume": (df["user_id"] + 1).astype(float),
    }).to_csv(out, index=False)
    return {"rows": len(df), "gen_sec": round(time.time() - t0, 2),
            "start": str(ts.min()), "end": str(ts.max())}


def run(cmd, cwd, env=None, tag=""):
    t0 = time.time()
    e = os.environ.copy()
    if env:
        e.update(env)
    p = subprocess.run(cmd, cwd=cwd, env=e, capture_output=True, text=True)
    sec = round(time.time() - t0, 2)
    tail = "\n".join((p.stdout + p.stderr).splitlines()[-8:])
    print(f"--- {tag}: exit={p.returncode} {sec}s\n{tail}")
    if p.returncode != 0:
        raise SystemExit(f"{tag} failed")
    return sec


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    DATA.mkdir(parents=True, exist_ok=True)
    WORK.mkdir(parents=True, exist_ok=True)
    for f in DATA.glob("*.csv"):
        if f.name != "historical_tick_data_3.csv":
            f.unlink()

    meta = gen_ticks(sf_dir)
    print(f"--- ticks: {meta}")
    # span args cover the full generated range (stage 2 closed, stage 3 half-open)
    start, end = "2024-01-01T00:00:00+00:00", "2024-02-01T00:00:00+00:00"

    s2 = run([sys.executable, str(REF / "aggregator_candles.py"), start, end, "1", "1"],
             cwd=WORK, tag="stage2 aggregator_candles")
    candles = (DATA / "candles_1s.csv")
    n_candles = sum(1 for _ in open(candles)) - 1 if candles.exists() else 0

    s3 = run([sys.executable, str(REF / "candle_to_calcs.py"), start, end],
             cwd=WORK, env={"PYTHONPATH": str(SHIMS)}, tag="stage3 candle_to_calcs")
    calc = DATA / "candles_1s_calculated.csv"
    n_calc = sum(1 for _ in open(calc)) - 1 if calc.exists() else 0

    res = {"sf_dir": sf_dir, "ticks": meta["rows"], "candles": n_candles,
           "calculated_rows": n_calc, "stage2_sec": s2, "stage3_sec": s3,
           "gen": meta}
    (BASE / "results.json").write_text(json.dumps(res, indent=2))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
