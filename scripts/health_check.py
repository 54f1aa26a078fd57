"""One-command repo health check (fast): meant as the first thing a new
session runs. CPU-only, ~2 minutes.

  python scripts/health_check.py

Checks: package imports, a quick test subset, entry() compile, 8-device
dryrun, native featurizer availability.
"""

import os
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
           XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8").strip())


def run(label, cmd, timeout=240):
    try:
        r = subprocess.run(cmd, cwd=REPO, env=ENV, capture_output=True,
                           text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"[FAIL] {label} (timed out after {timeout}s)")
        return False
    ok = r.returncode == 0
    print(f"[{'OK' if ok else 'FAIL'}] {label}")
    if not ok:
        print(r.stdout[-2000:])
        print(r.stderr[-2000:])
    return ok


def main():
    results = [
        run("imports", [sys.executable, "-c",
                        "import jax; jax.config.update('jax_platforms','cpu'); "
                        "import immunostruct_tpu; "
                        "from immunostruct_tpu.models import model_map; "
                        "assert len(model_map) == 14"]),
        run("quick tests", [sys.executable, "-m", "pytest",
                            "tests/test_ops.py", "tests/test_metrics.py",
                            "tests/test_data.py", "-q", "--no-header"]),
        run("entry compile", [sys.executable, "-c",
                              "import jax; jax.config.update('jax_platforms','cpu'); "
                              "import __graft_entry__ as g; fn, a = g.entry(); "
                              "print(jax.jit(fn)(*a).shape)"]),
        run("8-device dryrun", [sys.executable, "-c",
                                "import __graft_entry__ as g; g.dryrun_multichip(8)"]),
        run("native featurizer", [sys.executable, "-c",
                                  "from immunostruct_tpu.featurize.native import native_available; "
                                  "print('native', native_available())"]),
    ]
    print(f"\n{sum(results)}/{len(results)} checks passed")
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
