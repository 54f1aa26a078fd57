"""Post-process the round-4 on-chip measurement queue (/tmp/onchip/*.log).

Run by the TPU-recovery orchestrator right after ``bench.py`` and the v8
kernel race so a recovered pool window is exploited even if no interactive
session is alive (round 3/4 sessions kept dying on gateway 529s):

1. ``bench.log``  -> ``benchmarks/bench_r04_local.json`` (only if the JSON
   is a real measurement, i.e. ``value`` > 0).
2. ``race_v8.log`` -> ``benchmarks/bench_r04_race.json`` plus the adoption
   decision: if a v8 sub-tiled variant (``inner2``/``inner4``) beats the
   production default (``diff16``) by >= ``MARGIN_MS`` at matching loss,
   flip ``MEGA_INNER`` in ``ops/pallas_mega.py`` to the winner, re-run the
   kernel parity tests CPU-side, and touch ``/tmp/onchip/adopted`` so the
   orchestrator re-benches. A failed parity run reverts the edit.
3. ``git commit`` whatever it changed (descriptive message; nothing else
   staged).

Idempotent: re-running with the same logs rewrites the same files and
makes no second commit (git sees no diff).
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
ONCHIP = pathlib.Path("/tmp/onchip")
MARGIN_MS = 0.15
CPU_ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}
CPU_ENV.pop("PALLAS_AXON_POOL_IPS", None)


def last_json_line(path: pathlib.Path):
    if not path.exists():
        return None
    obj = None
    for line in path.read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
    return obj


def handle_bench(log_name: str, out_name: str) -> list[str]:
    bench = last_json_line(ONCHIP / log_name)
    if not bench or not bench.get("value"):
        print(f"{log_name}: no valid measurement JSON; skipping")
        return []
    out = REPO / "benchmarks" / out_name
    out.write_text(json.dumps(bench, indent=1) + "\n")
    print(f"{log_name}: value={bench['value']} vs_baseline="
          f"{bench.get('vs_baseline')} -> {out}")
    return [str(out.relative_to(REPO))]


def handle_race() -> list[str]:
    race = last_json_line(ONCHIP / "race_v8.log")
    if not race:
        print("race_v8.log: no result JSON; skipping adoption")
        return []
    out = REPO / "benchmarks" / "bench_r04_race.json"
    out.write_text(json.dumps(race, indent=1) + "\n")
    changed = [str(out.relative_to(REPO))]

    # variant name -> (MEGA_INNER, MEGA_TAIL_INNER)
    def subtile_factors(v: str):
        if m := re.fullmatch(r"inner(\d+)", v):
            return int(m.group(1)), 1
        if m := re.fullmatch(r"tinner(\d+)", v):
            return 1, int(m.group(1))
        if m := re.fullmatch(r"combo(\d+)x(\d+)", v):
            return int(m.group(1)), int(m.group(2))
        if m := re.fullmatch(r"combo(\d)(\d)", v):
            return int(m.group(1)), int(m.group(2))
        return None
    flags = {v: f for v in race if (f := subtile_factors(v))}
    base = race.get("diff16")
    inners = {v: race[v] for v in flags if v in race}
    if not base or not inners:
        print("race_v8.log: missing diff16 control or inner variants")
        return changed
    win_name = min(inners, key=lambda v: inners[v]["p50_ms"])
    win = inners[win_name]
    gain = base["p50_ms"] - win["p50_ms"]
    loss_ok = abs(win["loss0"] - base["loss0"]) <= 1e-3 * max(
        1.0, abs(base["loss0"]))
    print(f"race: diff16 p50={base['p50_ms']} {win_name} p50="
          f"{win['p50_ms']} gain={gain:.3f} ms loss_ok={loss_ok}")
    if gain < MARGIN_MS or not loss_ok:
        print("no adoption (below margin or loss mismatch)")
        return changed

    fwd_n, tail_n = flags[win_name]
    mega = REPO / "immunostruct_tpu" / "ops" / "pallas_mega.py"
    src = mega.read_text()
    new_src, n1 = re.subn(r"^MEGA_INNER = \d+",
                          f"MEGA_INNER = {fwd_n}", src, count=1,
                          flags=re.MULTILINE)
    new_src, n2 = re.subn(r"^MEGA_TAIL_INNER = \d+",
                          f"MEGA_TAIL_INNER = {tail_n}", new_src, count=1,
                          flags=re.MULTILINE)
    if n1 != 1 or n2 != 1:
        print("MEGA_INNER/MEGA_TAIL_INNER lines not found; no adoption")
        return changed
    mega.write_text(new_src)
    parity = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x",
         "tests/test_pallas_mega.py::test_mega_inner_subtiling_matches",
         "tests/test_pallas_mega.py::test_mega_tail_inner_subtiling_matches",
         "tests/test_pallas_mega.py::test_mega_matches_onehot_forward_and_grads"],
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True,
        timeout=1800)
    if parity.returncode != 0:
        mega.write_text(src)  # revert
        print("parity FAILED after flip; reverted:\n"
              + parity.stdout[-2000:])
        return changed
    (ONCHIP / "adopted").write_text(win_name + "\n")
    print(f"ADOPTED MEGA_INNER={inner_n} (parity green)")
    changed.append(str(mega.relative_to(REPO)))
    return changed


def handle_race_record(log_name: str, out_name: str) -> list[str]:
    """Record a secondary race JSON (e.g. the realistic-shape E=1408 race)
    WITHOUT driving adoption: the global default stays tuned for the
    bench headline shape, and a factor valid only at one shape (11 at
    E=1408) would silently disable sub-tiling at the other."""
    race = last_json_line(ONCHIP / log_name)
    if not race:
        return []
    out = REPO / "benchmarks" / out_name
    out.write_text(json.dumps(race, indent=1) + "\n")
    print(f"{log_name}: recorded -> {out}")
    return [str(out.relative_to(REPO))]


MARK_BEGIN = "<!-- onchip-r04:begin (auto-maintained, do not hand-edit) -->"
MARK_END = "<!-- onchip-r04:end -->"


def handle_results_append() -> list[str]:
    """Maintain a marked raw-results section in benchmarks/RESULTS.md so
    the on-chip evidence reaches the repo even if no interactive session
    survives to write prose. Idempotent: the marked block is rewritten in
    place from whatever queue logs exist."""
    parts = []
    for name, tail_n in (("bench", 1), ("race_v8", 12), ("race_1408", 8),
                         ("bench_post", 1), ("occupancy", 18),
                         ("geometric", 10), ("seeds23", 3)):
        log = ONCHIP / f"{name}.log"
        if not log.exists():
            continue
        lines = [ln for ln in log.read_text().splitlines() if ln.strip()]
        parts.append(f"**{name}** (last {min(tail_n, len(lines))} lines of "
                     f"`/tmp/onchip/{name}.log`):\n\n```\n"
                     + "\n".join(lines[-tail_n:]) + "\n```")
    if not parts:
        return []
    block = (f"{MARK_BEGIN}\n\n### Round-4 on-chip queue: raw results "
             "(auto-appended by scripts/onchip_postprocess.py)\n\n"
             + "\n\n".join(parts) + f"\n\n{MARK_END}\n")
    results = REPO / "benchmarks" / "RESULTS.md"
    text = results.read_text()
    if MARK_BEGIN in text:
        head, rest = text.split(MARK_BEGIN, 1)
        _, tail = rest.split(MARK_END, 1)
        text = head + block + tail.lstrip("\n")
    else:
        # insert right after the round-4 section header paragraph
        text = text.rstrip() + "\n\n" + block
    results.write_text(text)
    print("RESULTS.md: on-chip raw-results block updated")
    return [str(results.relative_to(REPO))]


def main() -> None:
    changed = handle_bench("bench.log", "bench_r04_local.json")
    changed += handle_race()
    changed += handle_race_record("race_1408.log", "bench_r04_race1408.json")
    changed += handle_bench("bench_post.log", "bench_r04_local.json")
    changed += handle_results_append()
    if not changed:
        return
    subprocess.run(["git", "add", "--"] + sorted(set(changed)), cwd=REPO,
                   check=True)
    msg = "Record round-4 on-chip results"
    if (ONCHIP / "adopted").exists():
        winner = (ONCHIP / "adopted").read_text().strip()
        msg += f"; adopt v8 {winner} as the production default"
    diff = subprocess.run(["git", "diff", "--cached", "--quiet"], cwd=REPO)
    if diff.returncode != 0:
        subprocess.run(
            ["git", "commit", "-m", msg,
             "-m", "Automated by scripts/onchip_postprocess.py from the "
                   "TPU-recovery queue (see benchmarks/RESULTS.md)."],
            cwd=REPO, check=True)
        print("committed:", msg)
    else:
        print("nothing new to commit")


if __name__ == "__main__":
    main()
