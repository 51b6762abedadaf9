#!/usr/bin/env python
"""Remove generated sweep scripts (~ reference scripts/delete_scripts.py)."""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default=os.path.join(os.path.dirname(__file__),
                                                 "generated"))
    args = p.parse_args()
    if not os.path.isdir(args.dir):
        print("nothing to delete")
        return
    n = 0
    for f in os.listdir(args.dir):
        if f.endswith(".sh"):
            os.remove(os.path.join(args.dir, f))
            n += 1
    print(f"deleted {n} scripts")


if __name__ == "__main__":
    main()
