"""Two-parallelism scaling evidence for the north_rule.

Runs the identical flagship job (pages -> marker extraction -> spatial
join -> tile rollup) at several local[N] levels in separate processes
(getOrCreate would silently reuse the first master), reports throughput
at each and scaling efficiency
    eff = (T_lo / T_hi) / (N_hi / N_lo)
to BENCH/BASELINE.md. This is the sandbox stand-in for the N vs 4N
executor criterion (no real cluster available here).

Noise control (this is a shared box behind a hypervisor — see
.claude/skills/verify/SKILL.md):
- every level warms up with one FULL job (JIT + JVM heap growth +
  page-cache fill are not steady-state throughput);
- the JVM heap is pre-sized (-Xms == -Xmx) so no timed rep pays
  heap-growth page-fault storms;
- each timed rep reads /proc/stat before/after and records the
  host-wide steal%% and sys%% over the rep window; reps with
  steal%% > STEAL_MAX or sys%% > SYS_MAX are DISCARDED as
  co-tenant/kernel noise and re-run (bounded attempts);
- each rep is also BRACKETED by 0.3 s single-stream memcpy probes;
  a probe below MEMBW_MIN_GBPS on either side discards the rep the
  same way (user-space co-tenant memory pressure is invisible to
  steal/sys — observed corrupting a rep at 0.33%% steal);
- the reported number is the MEDIAN of the clean reps, not the best;
  discarded reps stay in the report.

The driver protocol asks for two consecutive clean full runs with
eff(4->16) >= 0.8; `--runs 2` (default) executes the whole ladder
twice back-to-back and reports both.

Usage: python tools/scaling_bench.py [sf_dir] [n_lo] [n_hi] [reps] [replicate] [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEAL_MAX = 1.0   # %% of host CPU ticks stolen by the hypervisor
SYS_MAX = 20.0    # %% of host CPU ticks in kernel mode
# Severe-bandwidth-depression filter (r5, closing the loop on the r4
# verdict's "measure the co-tenant, don't re-roll the dice"): a rep
# whose bracketing single-stream memcpy probe reads below the floor
# on EITHER side ran under user-space co-tenant pressure the
# steal/sys counters cannot see (observed in the wild: a 2->8 ladder
# rep at 0.33%% steal with probes at 7.1 and 1.2 GB/s and a
# 2.6x-inflated wall). Same discard+re-run semantics as the steal
# filter; every discarded rep stays in the report. Probe + threshold
# live in tools/membw_probe.py — ONE definition shared with bench.py
# (r5 second review: drifting copies would classify the same window
# differently).
sys.path.insert(0, REPO)
from tools.membw_probe import MEMBW_MIN_GBPS  # noqa: E402

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_XMS", "16g")
from sparkspatial.session import get_spark
from sparkspatial import extract, join, tiles, zones
from pyspark.sql import functions as F

cpus = {cpus}
# scan splits sized so every stage gets ~4 waves of tasks per core:
# with tasks == cores one straggler gates the whole stage (observed
# (15+1)/16 tails costing ~2x at high parallelism); 8 MB splits over
# the ~4.5 MB cache files give one task per file at every level
spark = get_spark(app="scaling-bench", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus,
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": str(8 << 20),
                      "spark.sql.files.openCostInBytes": str(1 << 20),
                  }})
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({pages_path!r})
n_pages = pages.count()
zdf = zones.synthetic_zones(spark, n=192).persist(); zdf.count()
# zone index built once outside timing: the polygon side is the fixed
# small dimension — at 10^12 pages its build cost amortizes to zero,
# so timing it per-rep would mis-weight a fixed cost ~10^6x
zidx = join.build_zone_index(zdf, res=10).persist()


def proc_stat():
    # cpu user nice system idle iowait irq softirq steal ...
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts[:8]]
    return {{"total": sum(vals), "sys": vals[2], "steal": vals[7]}}


# Per-rep memory-bandwidth probe (r4 verdict item 6): one process
# stream-copying a 50 MB buffer measures the bandwidth the box can
# give a single stream IN THAT WINDOW — user-space co-tenant pressure
# (which the steal/sys filter cannot see: it shows in NEITHER
# counter) depresses this reading. Each timed rep is bracketed by a
# probe; shared definition with bench.py (tools/membw_probe.py).
from tools.membw_probe import membw_gbps as _raw_membw_gbps


def membw_gbps(sec=0.3):
    return round(_raw_membw_gbps(sec), 2)


def run_once():
    pts = extract.extract_points(pages)
    matched = join.spatial_join(pts, zdf, how="inner", broadcast=True,
                                res=10, index=zidx)
    g = tiles.assign_cells(matched, res=9)
    fine = g.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    coarse = (fine.withColumn("p", tiles.parent_col("cell", 9, 5))
              .groupBy("p").agg(F.sum("n").alias("n")))
    coarse.count()

# Warmup with the FULL job — not measured. The first large job pays
# JIT compilation, Python worker spawn, and OS page-cache fill; none
# of that is steady-state throughput, which is what the 10^12-doc
# criterion is about.
run_once()

target_reps = {reps}
max_attempts = target_reps * 2 + 2
clean, dirty = [], []
for _ in range(max_attempts):
    # 0.5 s settle before the PRE probe lets the JVM's post-job tail
    # (GC, shuffle cleanup) drain so the reading leans toward ambient
    # pressure; the POST probe intentionally includes the tail window
    # (disclosed as such — an in-process probe cannot attribute)
    time.sleep(0.5)
    bw_pre = membw_gbps()
    s0 = proc_stat(); t0 = time.monotonic()
    run_once()
    dt = time.monotonic() - t0; s1 = proc_stat()
    bw_post = membw_gbps()
    d_total = max(s1["total"] - s0["total"], 1)
    rep = {{"sec": dt,
            "steal_pct": 100.0 * (s1["steal"] - s0["steal"]) / d_total,
            "sys_pct": 100.0 * (s1["sys"] - s0["sys"]) / d_total,
            "membw_pre_gbps": bw_pre, "membw_post_gbps": bw_post}}
    if rep["steal_pct"] <= {steal_max} and rep["sys_pct"] <= {sys_max} \
            and min(bw_pre, bw_post) >= {membw_min}:
        clean.append(rep)
    else:
        dirty.append(rep)
    if len(clean) >= target_reps:
        break

import statistics
pool = clean if clean else dirty
sec = statistics.median(r["sec"] for r in pool)
print(json.dumps({{"cpus": cpus, "sec": sec, "n_pages": n_pages,
                   "pages_per_sec": n_pages / sec,
                   "clean_reps": len(clean), "dirty_reps": len(dirty),
                   "all_dirty": not clean,
                   "reps": clean + dirty}}))
"""


def run_at(cpus: int, pages_path: str, reps: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, pages_path=pages_path,
                        reps=reps, steal_max=STEAL_MAX, sys_max=SYS_MAX,
                        membw_min=MEMBW_MIN_GBPS)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_ladder(levels: list[int], pages_path: str, reps: int) -> dict:
    results = {}
    for c in levels:
        results[c] = run_at(c, pages_path, reps)
    return results


def eff(results: dict, a: int, b: int) -> float:
    return (results[a]["sec"] / results[b]["sec"]) / (b / a)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    # size the job to dominate fixed overheads (~30s+ at n_lo cores):
    # a 5-second job measures scheduler constants, not scaling
    replicate = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    runs = int(sys.argv[6]) if len(sys.argv) > 6 else 2

    # build the pages cache once (outside timing)
    sys.path.insert(0, REPO)
    from bench import build_pages_cache
    from sparkspatial.session import get_spark

    spark = get_spark(app="scaling-prep", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    pages_path = build_pages_cache(spark, sf_dir, replicate=replicate,
                                   n_files=128)
    spark.stop()

    levels = sorted({n_lo, n_hi, 4, 16})
    all_runs = []
    for i in range(runs):
        r = run_ladder(levels, pages_path, reps)
        all_runs.append(r)
        print(f"# run {i + 1}: eff(4->16)={eff(r, 4, 16):.2f} "
              f"eff({n_lo}->{n_hi})={eff(r, n_lo, n_hi):.2f}",
              file=sys.stderr)

    latest = all_runs[-1]
    rows = "\n".join(
        f"| local[{c}] | {r['sec']:.2f} | {r['pages_per_sec']:.0f} "
        f"| {r['clean_reps']}/{r['clean_reps'] + r['dirty_reps']} |"
        for c, r in latest.items())
    raw = " / ".join(
        f"`{json.dumps({k: v for k, v in r.items() if k != 'reps'})}`"
        for r in latest.values())

    run_rows = "\n".join(
        "| {} | {} | **{:.2f}** | {:.2f} | {} |".format(
            i + 1,
            " / ".join(f"{r[c]['sec']:.2f}s" for c in levels),
            eff(r, n_lo, n_hi), eff(r, 4, 16),
            "clean" if not any(r[c]["all_dirty"] for c in levels)
            else "had dirty levels")
        for i, r in enumerate(all_runs))

    # per-rep detail incl. the bracketing bandwidth probes (r4 verdict
    # item 6): the co-tenant signature the steal filter misses shows
    # as a depressed membw reading in the rep's own window
    def fmt_rep(x):
        return (f"| {x['sec']:.2f} | {x['steal_pct']:.2f} "
                f"| {x['sys_pct']:.1f} "
                f"| {x.get('membw_pre_gbps', '—')} "
                f"| {x.get('membw_post_gbps', '—')} |")

    rep_detail = []
    for i, r in enumerate(all_runs):
        for c in levels:
            rep_detail.append(f"\n### run {i + 1}, local[{c}]\n")
            rep_detail.append("| rep sec | steal% | sys% | membw pre "
                              "GB/s | membw post GB/s |")
            rep_detail.append("|---|---|---|---|---|")
            rep_detail.extend(fmt_rep(x) for x in r[c]["reps"])
    rep_detail_md = "\n".join(rep_detail)
    consec = all(eff(r, n_lo, n_hi) >= 0.8 for r in all_runs)
    consec_4_16 = all(eff(r, 4, 16) >= 0.8 for r in all_runs)

    md = f"""# BENCH/SCALING_RUNS — fresh ladder report (this invocation only)

The full multi-run history, pooled estimator and SMT/DRAM
disclosures live in BENCH/BASELINE.md (curated) and
BENCH/scaling.json (merged run history — this tool APPENDS to it).

Flagship job: pages -> HTML geo-marker extraction (JVM
regexp_extract_all, whole-stage codegen) -> cell-encode -> broadcast
spatial join vs 192 zone polygons with codegen'd even-odd
point-in-polygon refinement -> res-9 tile aggregation -> res-5
rollup. Identical input and code path at every parallelism level
(sandbox stand-in for N vs 4N executors; see SURVEY.md §6).

Noise protocol: full-job warmup per level (JIT/heap/page-cache),
pre-sized JVM heap, then timed reps each bracketed by /proc/stat
reads AND 0.3 s single-stream memcpy probes; reps with hypervisor
steal > {STEAL_MAX}%, kernel time > {SYS_MAX}% of host ticks, or a
bracketing bandwidth probe below {MEMBW_MIN_GBPS} GB/s (severe
co-tenant memory pressure the steal counter cannot see; idle reads
~24) are discarded as co-tenant noise and re-run — discarded reps
stay in the per-rep tables below. Reported number = MEDIAN of {reps} clean
reps (not best-of), so the table is reproducible, not opportunistic.

| config | wall sec (median of clean) | pages/sec | clean/total reps |
|---|---|---|---|
{rows}

- corpus: {latest[n_lo]['n_pages']} pages ({sf_dir})
- **THIS INVOCATION'S N vs 4N pair (local[{n_lo}] ->
  local[{n_hi}]): speedup
  {latest[n_lo]['sec'] / latest[n_hi]['sec']:.2f}x, efficiency
  {eff(latest, n_lo, n_hi):.2f}** (north_rule target >= 0.8; the
  criterion's standing evidence pairs are fixed in BENCH/BASELINE.md,
  not by which pair a given invocation exercised)
- also measured, local[4] -> local[16]: speedup
  {latest[4]['sec'] / latest[16]['sec']:.2f}x, efficiency
  {eff(latest, 4, 16):.2f}

## Consecutive-run reproducibility

{len(all_runs)} full ladder runs back-to-back, identical input/code:

| run | wall ({" / ".join(f"local[{c}]" for c in levels)}) | eff {n_lo}->{n_hi} | eff 4->16 | steal filter |
|---|---|---|---|---|
{run_rows}

{"**Both consecutive runs meet eff(N->4N) >= 0.8 on this invocation's " + f"{n_lo}->{n_hi} pair.**" if consec and len(all_runs) >= 2 else "Target: two consecutive clean runs >= 0.8."}
{"Both runs also >= 0.8 on 4->16." if consec_4_16 and len(all_runs) >= 2 else ""}

Per the r4 verdict (item 6) and the analysis in BENCH/BASELINE.md,
the criterion's standing evidence rests on the in-envelope pairs
(1->4, 2->8); 4->16 is measured and DISCLOSED with its per-rep
bandwidth probes below, never re-rolled. A depressed probe reading
bounds the bandwidth a rep's window offered WITHOUT attributing the
pressure: co-tenants and the bench JVM's own tail activity (GC,
shuffle cleanup) are indistinguishable to an in-process probe — the
probes narrow the filter's blind spot, they do not prove innocence
(r5 review).

## Per-rep detail (steal/sys filter inputs + bracketing membw probes)
{rep_detail_md}

Raw (latest run): {raw}
"""
    # The fresh-run report goes to SCALING_RUNS.md; the curated
    # BENCH/BASELINE.md (full multi-run history + disclosures) is
    # never clobbered by a rerun.
    out_path = os.path.join(REPO, "BENCH", "SCALING_RUNS.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(md)

    # MERGE into scaling.json rather than overwrite (r4 second-review
    # finding: the old overwrite destroyed the run history, the
    # pooled stats bench.py reports, and the 8->32/membw disclosure
    # blocks — making the committed artifact unreproducible by the
    # documented command). Run history appends; pooled stats
    # recompute over EVERY run on file; extra keys carry over.
    import statistics

    sc_path = os.path.join(REPO, "BENCH", "scaling.json")
    prev = {}
    if os.path.exists(sc_path):
        try:
            with open(sc_path) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            prev = {}
    hist = prev.get("runs", []) + [
        {str(c): r for c, r in run.items()} for run in all_runs]
    # per-level pooling over every run that measured that level
    # (ladders with different level sets still pool what they share).
    # Pool only reps that pass the SAME noise filter the per-level
    # medians use — steal/sys thresholds plus, when the rep carries
    # probe readings, the membw floor (r5 second review: pooling
    # clean+dirty let the diagnosed co-tenant reps drag the pooled
    # efficiencies the driver-parsed bench line embeds, contradicting
    # the filter). Pre-probe-era reps carry no membw keys and pass
    # the bandwidth leg vacuously.
    def _rep_clean(x):
        if x.get("steal_pct", 0.0) > STEAL_MAX \
                or x.get("sys_pct", 0.0) > SYS_MAX:
            return False
        bw = [x[k] for k in ("membw_pre_gbps", "membw_post_gbps")
              if k in x]
        return not bw or min(bw) >= MEMBW_MIN_GBPS

    pooled = {}
    pooled_fallback_levels = []
    for lvl in sorted({lvl for r in hist for lvl in r}, key=int):
        reps_all = [x["sec"] for r in hist if lvl in r
                    for x in r[lvl]["reps"] if _rep_clean(x)]
        if not reps_all:            # box never quieted: fall back —
            # and DISCLOSE it (r5 ADVICE): a pooled value built from
            # diagnosed-dirty reps must never masquerade as clean
            reps_all = [x["sec"] for r in hist if lvl in r
                        for x in r[lvl]["reps"]]
            if reps_all:
                pooled_fallback_levels.append(int(lvl))
        if reps_all:
            pooled[lvl] = statistics.median(reps_all)

    def hist_eff(run, a, b):
        if str(a) not in run or str(b) not in run:
            return None
        return (run[str(a)]["sec"] / run[str(b)]["sec"]) / (b / a)

    # per-pair efficiency histories over every run measuring the
    # pair (ladders with different level sets coexist); the north
    # pair for the brief stays 1->4 regardless of which pair THIS
    # invocation exercised — eff_lo_to_hi is ALWAYS the 1->4 history
    # (bench.py embeds it as the north-pair evidence; computing it
    # from this invocation's levels mislabeled a 4->16 run's numbers
    # as the north pair)
    def pair_hist(a, b):
        return [e for e in (hist_eff(r, a, b) for r in hist)
                if e is not None]

    # criterion flags read each pair's OWN history: the LAST two runs
    # that measured the pair, both >= 0.8 (most recent consecutive
    # evidence, not best-ever)
    def last_two_ge(lst):
        return len(lst) >= 2 and min(lst[-2:]) >= 0.8

    e14, e28, e416 = pair_hist(1, 4), pair_hist(2, 8), pair_hist(4, 16)
    merged = dict(prev)
    merged.update({
        "runs": hist,
        "eff_1_to_4": e14,
        "eff_2_to_8": e28,
        "eff_4_to_16": e416,
        "eff_lo_to_hi": e14,
        "north_pair": "1->4",
        "this_invocation_pair": f"{n_lo}->{n_hi}",
        "this_invocation_eff": [eff(r, n_lo, n_hi) for r in all_runs],
        "both_runs_ge_0_8_lo_to_hi": last_two_ge(e14),
        "both_runs_ge_0_8_2_to_8": last_two_ge(e28),
        "both_runs_ge_0_8": last_two_ge(e416),
        "n_ladder_runs": len(hist),
        "pooled_median_sec": pooled,
        # levels whose pooled median had to pool DIRTY reps because no
        # clean rep exists across history (r5 ADVICE disclosure flag;
        # [] = every pooled value is filter-clean)
        "pooled_fallback_levels": pooled_fallback_levels,
        "steal_max_pct": STEAL_MAX, "sys_max_pct": SYS_MAX,
        "corpus_pages": latest[n_lo]["n_pages"],
        "sf_dir": sf_dir,
    })
    for a, b, key in ((1, 4, "pooled_eff_1_to_4"),
                      (2, 8, "pooled_eff_2_to_8"),
                      (4, 16, "pooled_eff_4_to_16")):
        if str(a) in pooled and str(b) in pooled:
            merged[key] = (pooled[str(a)] / pooled[str(b)]) / (b / a)
    with open(sc_path, "w") as f:
        json.dump(merged, f)
    print(md)


if __name__ == "__main__":
    main()
