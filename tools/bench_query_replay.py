#!/usr/bin/env python
"""Query-stage scaling replay: the two-cluster-size criterion measured on
the QUERY stages alone, warm, over the per-level checkpoints an earlier
`tools/bench_scaling.py` run built.

Why this exists: a fresh full-job run measures each query stage exactly
once per level, seconds after that level's JVM finished writing ~8 GB of
build checkpoints — heap, code cache and page cache are in a post-build
state that differs between levels and runs, and on this shared VM that
single sample swings the two-level kNN ratio by 2x run-to-run (measured:
the same code and input gave flagship ratios 0.51 and 0.86 on the same
day).  A long-lived cluster serves queries from a settled process over a
built index, which is exactly what a warm replay measures: per level this
reruns `jobs/run.py` WITHOUT `--fresh`, so every build stage resumes from
its parquet checkpoint (identical bytes to what that level's fresh run
wrote — `StageCheckpoint.run_stage` always returns the parquet read-back,
so the fresh run's queries saw the same input shape) and only the query
stages execute their warm min-of-reps protocol.  Build-stage throughput is
taken from the fresh run; this tool reports ONLY the query stages, best of
``--reps`` replays per level.

Usage: python tools/bench_query_replay.py --rows 128000000 --probes 96000 \
          --low 2 --high 8 --reps 2
Requires /tmp/locus_scaling_ck_{low,high}/r{rows}_c{level} checkpoints.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
STAGE_METRICS = {
    "box": "box_join_rows_per_s",
    "ball": "ball_join_rows_per_s",
    "knn": "knn_rows_per_s",
}


def replay_level(
    rows: int, probes: int, cores: int, query_reps: int = 4,
    stages: str = "box,ball,knn",
) -> dict:
    ck = pathlib.Path(f"/tmp/locus_scaling_ck_{cores}/r{rows}_c{cores}")
    if not ck.is_dir():
        raise SystemExit(
            f"missing build checkpoints at {ck} — run tools/bench_scaling.py "
            f"--rows {rows} --low/--high {cores} first (the replay only "
            "re-times query stages over an existing build)"
        )
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        sys.executable,
        str(REPO / "jobs" / "run.py"),
        "--rows", str(rows),
        "--probes", str(probes),
        "--cores", str(cores),
        "--checkpoint", f"/tmp/locus_scaling_ck_{cores}",
        # 4 timed reps per query stage: whole-stage-codegen JIT keeps
        # improving the kNN wall through the third rep at the high level
        # (measured at 128M/96k: 8-core reps 78.7 -> 44.5 -> 30.7 -> 32.0 s;
        # 2-core reps converge a rep earlier because each rep gives C2 ~4x
        # more wall over the same hot loops).  min-of-2 under-reports the
        # high level and deflates the efficiency ratio.  Alternate-load
        # datapoints (e.g. the 1M-probe block) pass fewer reps: their walls
        # are ~10x longer, so each rep already gives the JIT the hot-loop
        # exposure four short reps give the flagship load.
        "--query-reps", str(query_reps),
        "--stages", stages,
    ]
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"replay failed at cores={cores}")
    # take the LAST parseable JSON object that carries the job marker —
    # a debug print starting with '{' (e.g. future LOCUS_KNN_DEBUG output)
    # must not be mistaken for the report
    report = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and obj.get("job") == "pages_pipeline":
            report = obj
    if report is None:
        raise RuntimeError(f"no report JSON in replay output:\n{proc.stdout[-2000:]}")
    return report


def best_of(
    rows: int, probes: int, cores: int, reps: int, query_reps: int,
    stages: str, metrics: list[str],
) -> dict:
    runs = [
        replay_level(rows, probes, cores, query_reps, stages)
        for _ in range(reps)
    ]
    return {m: max(r[m] for r in runs) for m in metrics}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=128_000_000)
    ap.add_argument("--probes", type=int, default=96_000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--query-reps", type=int, default=4,
        help="timed executions per query stage inside each replay (min is "
        "kept); 4 for the short flagship-load walls, fewer for long "
        "alternate-load walls where one rep already warms the JIT",
    )
    ap.add_argument(
        "--marker",
        default="queryscaling",
        help="BENCH.md comment-marker block to (over)write — pass e.g. "
        "'probescaling' for an alternate (rows, probes) datapoint so the "
        "flagship block is not clobbered",
    )
    ap.add_argument(
        "--stages", default="box,ball,knn",
        help="comma subset of query stages to replay (passed through to "
        "jobs/run.py); alternate-load datapoints pass 'knn' so probe-capped "
        "box/ball walls are not re-paid",
    )
    args = ap.parse_args()
    factor = args.high / args.low
    stage_list = [s.strip() for s in args.stages.split(",") if s.strip()]
    metrics = [STAGE_METRICS[s] for s in stage_list]

    lo = best_of(args.rows, args.probes, args.low, args.reps,
                 args.query_reps, args.stages, metrics)
    hi = best_of(args.rows, args.probes, args.high, args.reps,
                 args.query_reps, args.stages, metrics)
    eff = {m: round(hi[m] / (factor * lo[m]), 3) for m in metrics}
    report = {
        "metric": "query_stage_scaling_replay",
        "rows": args.rows,
        "probes": args.probes,
        "low_cores": args.low,
        "high_cores": args.high,
        "throughput_low": lo,
        "throughput_high": hi,
        "efficiency": eff,
        "reps_per_level": args.reps,
        "stages": stage_list,
    }
    if "knn_rows_per_s" in eff:
        report["flagship_knn_efficiency"] = eff["knn_rows_per_s"]
    print(json.dumps(report))

    lines = [
        "Query-stage scaling, WARM REPLAY protocol (the steady-state a",
        "long-lived cluster serves from): the same `jobs/run.py` at both",
        "levels over each level's already-built checkpoints (build stages",
        "resume from parquet — identical input bytes to the fresh run's",
        f"query stages), best of {args.reps} replays per level, warm",
        f"min-of-{args.query_reps}-reps inside each replay (codegen JIT keeps improving the",
        "kNN wall through the third rep at the high level — each rep there",
        "is ~4x shorter, so C2 sees ~4x less of the hot loop per rep; 2",
        "reps under-report the high level and deflate the ratio).  The",
        "fresh-run table above remains",
        "the build-stage evidence; a single post-build query sample there",
        "rides on whatever JVM/page-cache state the build left behind and",
        "swings the flagship ratio by 2x run-to-run on this shared VM.",
        "",
        f"| query stage | rows/s @ local[{args.low}] | rows/s @ "
        f"local[{args.high}] | efficiency (tput_4N / {factor:g}·tput_N) |",
        "|---|---|---|---|",
    ]
    for m in metrics:
        lines.append(f"| {m} | {lo[m]:,.0f} | {hi[m]:,.0f} | **{eff[m]:.3f}** |")
    lines.append("")
    if "knn_rows_per_s" in eff:
        lines += [
            f"Flagship (kNN join) warm-replay efficiency: "
            f"**{eff['knn_rows_per_s']}** (target >= 0.8).",
            "",
        ]
    lines += [
        "Reproduce: `python tools/bench_query_replay.py"
        f" --rows {args.rows} --probes {args.probes}"
        f" --low {args.low} --high {args.high} --reps {args.reps}"
        f" --query-reps {args.query_reps} --stages {args.stages}"
        f" --marker {args.marker}`"
        " (after a bench_scaling.py run has built the checkpoints).",
    ]
    block = "\n".join(lines)
    bench_md = REPO / "BENCH.md"
    begin, end = f"<!-- {args.marker}:begin -->", f"<!-- {args.marker}:end -->"
    text = bench_md.read_text()
    if begin in text:
        head, rest = text.split(begin, 1)
        _, tail = rest.split(end, 1)
        text = head + begin + "\n" + block + "\n" + end + tail
    else:
        # insert after the flagship query-replay block when present, else
        # right after the fresh-run scaling block
        anchor = "<!-- queryscaling:end -->"
        if anchor not in text:
            anchor = "<!-- scaling:end -->"
        head, tail = text.split(anchor, 1)
        text = head + anchor + "\n\n" + begin + "\n" + block + "\n" + end + tail
    bench_md.write_text(text)
    sys.stderr.write("BENCH.md query-replay block updated\n")


if __name__ == "__main__":
    main()
