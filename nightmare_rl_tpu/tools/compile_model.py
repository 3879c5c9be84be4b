"""Compile MJCF robot models into System archives (host-side, needs mujoco).

Usage:
    python -m nightmare_rl_tpu.tools.compile_model [--xml PATH] [--out PATH]

With no arguments, compiles the bundled robot set from the reference checkout
(the runtime then only ever loads the .npz archives — no mujoco dependency).
"""

from __future__ import annotations

import argparse
import os

from nightmare_rl_tpu.physics import loader

_DEFAULT_MODELS = {
    # name -> (xml path, max contact support points per geom)
    # base gets more points (wide flat underside); tibias need the tip (via
    # the foot-site priority direction) plus a few shaft/extreme verts
    "nightmare_v3": (
        "/root/reference/models/nightmare_v3/mjmodel.xml",
        {"base_link": 10, "*": 5},
    ),
    "nightmare_v3_mjx": (
        "/root/reference/models/nightmare_v3/mjmodel_mjx.xml",
        {"base_link": 10, "*": 5},
    ),
    # quadruped morphology (BASELINE config 4); primitive collision geoms
    # (sphere feet + cylinder/box shells) — no mesh support points needed
    "anymal_c": ("/root/reference/models/anymal_c/scene.xml", {"*": 4}),
}

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--xml", default=None, help="single MJCF file to compile")
    p.add_argument("--out", default=None, help="output .npz path")
    p.add_argument("--max-points", type=int, default=6)
    args = p.parse_args()

    if args.xml:
        sys = loader.system_from_mjcf(args.xml, max_points_per_geom=args.max_points)
        out = args.out or os.path.splitext(args.xml)[0] + ".npz"
        loader.save_system(sys, out)
        print(f"{args.xml} -> {out}  (ncp={sys.ncp}, nv={sys.nv})")
        return

    os.makedirs(_ASSET_DIR, exist_ok=True)
    for name, (xml, maxp) in _DEFAULT_MODELS.items():
        sys = loader.system_from_mjcf(xml, max_points_per_geom=maxp)
        out = os.path.join(_ASSET_DIR, name + ".npz")
        loader.save_system(sys, out)
        print(f"{name}: ncp={sys.ncp} nv={sys.nv} nu={sys.nu} -> {out}")


if __name__ == "__main__":
    main()
