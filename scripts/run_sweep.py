#!/usr/bin/env python
"""Execute every generated sweep script (~ reference scripts/run_scripts.py)."""

import argparse
import os
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default=os.path.join(os.path.dirname(__file__),
                                                 "generated"))
    p.add_argument("--stop-on-error", action="store_true")
    args = p.parse_args()

    scripts = sorted(
        f for f in os.listdir(args.dir) if f.endswith(".sh")
    )
    failures = []
    for s in scripts:
        path = os.path.join(args.dir, s)
        print(f"=== running {s} ===", flush=True)
        rc = subprocess.call(["bash", path],
                             cwd=os.path.dirname(os.path.dirname(path)) or ".")
        if rc != 0:
            failures.append(s)
            if args.stop_on_error:
                sys.exit(rc)
    print(f"done: {len(scripts) - len(failures)}/{len(scripts)} succeeded")
    if failures:
        print("failed:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
