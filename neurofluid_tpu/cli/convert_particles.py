"""Convert particle dumps between formats (pkl/npz -> obj/ply).

CLI replacement for the reference's utils/particles_utils.py __main__
converter (reference utils/particles_utils.py:45-69).

Usage:
    python -m neurofluid_tpu.cli.convert_particles \
        --data_path dumps/ --dst_path out/ --record_type ply
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp

import numpy as np

from neurofluid_tpu.data import io as data_io


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--dst_path", required=True)
    p.add_argument("--record_type", default="ply", choices=["ply", "obj"])
    args = p.parse_args(argv)
    os.makedirs(args.dst_path, exist_ok=True)

    paths = sorted(
        glob.glob(osp.join(args.data_path, "*.pkl"))
        + glob.glob(osp.join(args.data_path, "*.npz"))
    )
    for path in paths:
        if path.endswith(".pkl"):
            pos, _vel = data_io.read_particles(path, "blender")
        else:
            pos, _vel = data_io.read_particles(path, "splishsplash")
        stem = osp.splitext(osp.basename(path))[0]
        dst = osp.join(args.dst_path, f"{stem}.{args.record_type}")
        if args.record_type == "ply":
            data_io.write_ply_pointcloud(pos, dst)
        else:
            with open(dst, "w") as fp:
                data_io.write_obj_pointcloud(pos, fp)
    print(f"converted {len(paths)} files -> {args.dst_path}")


if __name__ == "__main__":
    main()
