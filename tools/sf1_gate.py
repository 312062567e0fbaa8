#!/usr/bin/env python3
"""sf1-scale oracle gate driver: run the DuckDB compare over an existing
Verify dump in CHUNKS (one fresh process per chunk — DuckDB allocator
state accumulates across hundreds of heavy queries in one process), with
a memory cap + spill dir, then MERGE every chunk report into one
artifact in which EVERY query in oracle_sql.json has a recorded row:

  - pass            rows+schema+hash all matched
  - fail            compared and diverged (this is a real bug)
  - oracle_infeasible  the single-node oracle died (OOM / bad_alloc /
                    IO) — recorded WITH the error, never as absence.

The r13 gate lost 87 queries to unmerged chunk outputs; this driver
exists so that cannot recur: the merge step iterates oracle_sql.json,
not the chunk files, and errors out if any key has no row.

Usage:
  python3 tools/sf1_gate.py <sfDir> <verifyOutDir> <outJson>
      [--mem 24GB] [--threads 8] [--chunk 12] [--retry-mem 48GB]
      [--only REGEX]

Queries whose first attempt fails oracle-side are retried ONCE,
one-per-process, at --retry-mem before being recorded infeasible.
"""
import argparse, json, os, re, subprocess, sys, tempfile
from pathlib import Path

HERE = Path(__file__).resolve().parent
INFEASIBLE_PAT = re.compile(
    r"bad_alloc|OutOfMemory|Out of Memory|failed to allocate|"
    r"could not allocate|MemoryError|No space left|"
    r"Failed to create directory|IO Error", re.I)


def run_chunk(sf_dir, out_dir, names, mem, threads):
    """Run check.py over exactly `names` in a fresh process; return the
    per-query report dict (possibly partial if the process died)."""
    env = dict(os.environ, GRAFT_DUCKDB_MEM=mem, GRAFT_DUCKDB_THREADS=str(threads))
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        tmp = tf.name
    pat = "^(" + "|".join(re.escape(n) for n in names) + ")$"
    proc = subprocess.run(
        [sys.executable, str(HERE / "check.py"), sf_dir, out_dir,
         "--json", tmp, "--only", pat],
        env=env, capture_output=True, text=True)
    try:
        report = json.loads(Path(tmp).read_text()) if Path(tmp).exists() and \
            Path(tmp).read_text().strip() else {}
    except json.JSONDecodeError:
        report = {}
    finally:
        Path(tmp).unlink(missing_ok=True)
    # a chunk process that died mid-query (bad_alloc kills the whole
    # process before check.py can record) leaves absent keys — mark them
    # with the process tail so the retry pass picks them up with context
    if proc.returncode != 0 or len(report) < len(names):
        tail = (proc.stderr or proc.stdout or "")[-500:]
        for n in names:
            if n not in report:
                report[n] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"CHUNK DIED: {tail.strip()[-300:]}"}
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("out_json")
    ap.add_argument("--mem", default="24GB")
    ap.add_argument("--retry-mem", default="48GB")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=12)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    oracle = json.loads((Path(args.out_dir) / "oracle_sql.json").read_text())
    names = sorted(oracle)
    if args.only:
        pat = re.compile(args.only)
        names = [n for n in names if pat.search(n)]
    print(f"gate over {len(names)} queries, chunk={args.chunk}, mem={args.mem}")

    merged = {}
    for i in range(0, len(names), args.chunk):
        chunk = names[i:i + args.chunk]
        rep = run_chunk(args.sf_dir, args.out_dir, chunk, args.mem, args.threads)
        merged.update(rep)
        done = sum(1 for v in merged.values()
                   if v.get("hash_match") or v.get("err"))
        npass = sum(1 for v in merged.values() if v.get("hash_match"))
        print(f"  chunk {i // args.chunk + 1}: "
              f"{npass} pass / {len(merged)} recorded", flush=True)

    # retry oracle-side failures one-per-process at the bigger cap
    retry = [n for n in names
             if merged[n].get("err") and not merged[n].get("hash_match")]
    for n in retry:
        print(f"  retry {n} at {args.retry_mem}", flush=True)
        merged.update(run_chunk(args.sf_dir, args.out_dir, [n],
                                args.retry_mem, args.threads))

    # classify + completeness check
    absent = [n for n in names if n not in merged]
    if absent:
        sys.exit(f"MERGE BUG: {len(absent)} queries unrecorded: {absent[:5]}")
    summary = {"pass": 0, "fail": 0, "oracle_infeasible": 0}
    for n in names:
        v = merged[n]
        if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
            v["status"] = "pass"
        elif v.get("err") and INFEASIBLE_PAT.search(v["err"] or ""):
            v["status"] = "oracle_infeasible"
        elif v.get("err") and v["err"].startswith("CHUNK DIED"):
            v["status"] = "oracle_infeasible"
        else:
            v["status"] = "fail"
        summary[v["status"]] += 1
    out = {"n_queries": len(names), "summary": summary,
           "note": "sf1-scale gate: every oracle_sql.json key recorded; "
                   "oracle_infeasible = single-node DuckDB died (engine "
                   "dump was produced) — the error is recorded per query",
           "queries": {n: merged[n] for n in names}}
    Path(args.out_json).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out_json}: {summary}")
    sys.exit(1 if summary["fail"] else 0)


if __name__ == "__main__":
    main()
