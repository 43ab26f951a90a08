"""Run the real-chip test lane and record the evidence artifact.

Usage:  python tools/tpu_lane.py [--out TPU_LANE_rNN.json]

Runs ``URH_TPU_BACKEND=1 pytest tests -m tpu`` (the lane that executes
on the actual TPU backend — see tests/conftest.py) and writes a JSON
artifact with per-test outcomes and timings, so chip coverage is
evidenced next to BENCH, not merely asserted.

Only one process may use the TPU at a time: never run this concurrently
with bench.py or another TPU session.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_lane(out_path: str) -> dict:
    junit = os.path.join(tempfile.mkdtemp(prefix="tpu_lane"), "junit.xml")
    env = dict(os.environ, URH_TPU_BACKEND="1")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests", "-m", "tpu", "-q",
         f"--junitxml={junit}"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    wall = time.time() - t0

    tests = []
    counts = {"passed": 0, "failed": 0, "error": 0, "skipped": 0}
    try:
        root = ET.parse(junit).getroot()
        for case in root.iter("testcase"):
            name = "{}::{}".format(case.get("classname", ""),
                                   case.get("name", ""))
            if case.find("failure") is not None:
                outcome = "failed"
            elif case.find("error") is not None:
                outcome = "error"
            elif case.find("skipped") is not None:
                outcome = "skipped"
            else:
                outcome = "passed"
            counts[outcome] += 1
            tests.append({"test": name, "outcome": outcome,
                          "time_s": round(float(case.get("time", 0)), 3)})
    except (OSError, ET.ParseError):
        pass

    artifact = {
        "ok": proc.returncode == 0 and counts["passed"] >= 15
              and counts["failed"] + counts["error"] == 0,
        "returncode": proc.returncode,
        "backend_note": "URH_TPU_BACKEND=1 lane; tests skip unless "
                        "jax.default_backend() is tpu/axon",
        "counts": counts,
        "wall_s": round(wall, 1),
        "tests": tests,
        "pytest_tail": proc.stdout.strip().splitlines()[-3:],
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    return artifact


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(REPO,
                                                      "TPU_LANE_r05.json"))
    args = parser.parse_args()
    artifact = run_lane(args.out)
    print(json.dumps({"ok": artifact["ok"], "counts": artifact["counts"],
                      "wall_s": artifact["wall_s"], "out": args.out}))
    sys.exit(0 if artifact["ok"] else 1)


if __name__ == "__main__":
    main()
