#!/usr/bin/env python3
"""Convert wheel/odometry logs to TUM trajectory format.

Covers the reference's `OtherFiles/odom2txt_new.py`, which walks a rosbag's
`/odom` topic and prints `t x y z qx qy qz qw` lines for evaluate_ate.py.
This container has no rosbag; supported inputs:

  --json  newline-delimited JSON objects with
          {"t": sec, "pos": [x, y, z], "quat": [qx, qy, qz, qw]}
          (any producer — including a live ROS bridge — can emit this)
  --csv   comma- or whitespace-separated `t x y z qx qy qz qw`
          (already TUM-shaped; normalizes separators/comments)
  --se2   `t x y theta` planar odometry; the yaw angle is lifted to a
          quaternion about +y (the camera convention used by groundtruth)

Usage: python tools/odom2txt.py (--json|--csv|--se2) IN.log [OUT.txt]
"""

import argparse
import json
import math
import sys


def rows_json(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            o = json.loads(line)
            yield [o["t"]] + list(o["pos"]) + list(o["quat"])


def rows_csv(path):
    with open(path) as f:
        for line in f:
            line = line.replace(",", " ").strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            assert len(v) == 8, f"need 8 fields, got {len(v)}: {line!r}"
            yield v


def rows_se2(path):
    with open(path) as f:
        for line in f:
            line = line.replace(",", " ").strip()
            if not line or line.startswith("#"):
                continue
            t, x, y, th = (float(v) for v in line.split()[:4])
            half = th / 2.0
            yield [t, x, y, 0.0, 0.0, math.sin(half), 0.0, math.cos(half)]


def main():
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--json", action="store_true")
    g.add_argument("--csv", action="store_true")
    g.add_argument("--se2", action="store_true")
    ap.add_argument("infile")
    ap.add_argument("outfile", nargs="?")
    args = ap.parse_args()

    rows = (rows_json if args.json else rows_se2 if args.se2
            else rows_csv)(args.infile)
    out = open(args.outfile, "w") if args.outfile else sys.stdout
    n = 0
    for r in rows:
        out.write(f"{r[0]:.6f} " + " ".join(f"{v:.6f}" for v in r[1:]) + "\n")
        n += 1
    if args.outfile:
        out.close()
        print(f"wrote {n} poses to {args.outfile}")


if __name__ == "__main__":
    main()
