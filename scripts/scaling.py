"""N-vs-4N scaling-efficiency evidence (BASELINE.json north rule).

A real multi-executor cluster is unavailable in this sandbox, so the same
bench job runs at local[8] and local[32] on the same input (the sanctioned
substitution documented in SURVEY.md §6). Efficiency =
throughput_4N / (4 * throughput_N). Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench failed at cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n, n4 = 8, 32
    r_n = run(n, sf_dir)
    r_4n = run(n4, sf_dir)
    thr_n = r_n["input_rows"] * len(r_n["queries"]) / r_n["value"]
    thr_4n = r_4n["input_rows"] * len(r_4n["queries"]) / r_4n["value"]
    eff = thr_4n / (4.0 * thr_n)
    doc = {
        "sf_dir": sf_dir,
        "n_cpus": n,
        "n4_cpus": n4,
        "suite_sec_n": r_n["value"],
        "suite_sec_4n": r_4n["value"],
        "throughput_rows_per_sec_n": round(thr_n, 1),
        "throughput_rows_per_sec_4n": round(thr_4n, 1),
        "scaling_efficiency": round(eff, 3),
        "per_query_n": r_n["queries"],
        "per_query_4n": r_4n["queries"],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = [
        "# BENCH/BASELINE — throughput + N-vs-4N scaling evidence",
        "",
        "Sandbox substitution for the two-cluster-size criterion (no real",
        "cluster available): the identical bench job at `local[8]` and",
        "`local[32]` on the same input; efficiency = thr_4N / (4 * thr_N).",
        "",
        f"- input: `{sf_dir}` ({r_n['input_rows']} lineitem rows; {len(r_n['queries'])} headline queries)",
        f"- local[{n}]:  suite {r_n['value']} s, throughput {thr_n:,.0f} rows/s",
        f"- local[{n4}]: suite {r_4n['value']} s, throughput {thr_4n:,.0f} rows/s",
        f"- **scaling efficiency {eff:.3f}** (target >= 0.8 per BASELINE.json;",
        "  note: several headline stages are fixed-cost driver solves (RANSAC,",
        "  registration) that do not scale with cores — see per-query numbers)",
        "",
        "Per-query seconds:",
        "",
        "| query | local[8] | local[32] | speedup |",
        "|---|---|---|---|",
    ]
    for q in r_n["queries"]:
        a, b = r_n["queries"][q], r_4n["queries"][q]
        md.append(f"| {q} | {a} | {b} | {a / max(b, 1e-9):.2f}x |")
    md.append("")
    md.append("```json")
    md.append(json.dumps(doc, indent=2))
    md.append("```")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
