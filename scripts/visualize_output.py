#! /usr/bin/env python
"""Launch a visualization of a simulation's VTK output (port of ref
``scripts/visualize-output.py``).

The exporters write one ``.vtu`` per export index plus a ``.pvd`` time
series per field.  This script can regenerate the ``.pvd`` indices (for
runs that were continued or truncated by another run) and then launch
ParaView on a saved state, exactly like the reference:

    python scripts/visualize_output.py outputs my_visu_state.pvsm
    python scripts/visualize_output.py -r outputs my_visu_state.pvsm
    python scripts/visualize_output.py -r -f 20 -l 200 outputs s.pvsm

Where ParaView is unavailable (this image), ``--plot FIELD`` renders a
matplotlib quick-look of the latest ``.vtu`` of the given field instead.
"""
import argparse
import glob
import os
import re
import subprocess
import sys

PVD_HEADER = """<?xml version="1.0"?>
<VTKFile type="Collection" version="0.1">
  <Collection>
"""
PVD_FOOTER = "  </Collection>\n</VTKFile>\n"
PVD_ENTRY = '    <DataSet timestep="{t}" part="0" file="{f}"/>\n'


def regenerate_pvd(output_dir, first=0, last=None):
    """Rewrite every field's .pvd to list its .vtu series in
    [first, last] (ref visualize-output.py -r behaviour)."""
    for pvd in sorted(glob.glob(os.path.join(output_dir, "*", "*.pvd"))):
        d = os.path.dirname(pvd)
        vtus = sorted(glob.glob(os.path.join(d, "*_*.vtu")))
        entries = []
        for f in vtus:
            m = re.search(r"_(\d+)\.vtu$", f)
            if not m:
                continue
            ix = int(m.group(1))
            if ix < first or (last is not None and ix > last):
                continue
            entries.append((ix, os.path.basename(f)))
        with open(pvd, "w") as fh:
            fh.write(PVD_HEADER)
            for ix, f in sorted(entries):
                fh.write(PVD_ENTRY.format(t=ix, f=f))
            fh.write(PVD_FOOTER)
        print(f"regenerated {pvd}: {len(entries)} time steps")


def quick_plot(output_dir, field):
    """Matplotlib quick-look of the LAST .vtu of a field (tripcolor of
    the first data array)."""
    import numpy as np
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import xml.etree.ElementTree as ET

    vtus = sorted(glob.glob(os.path.join(output_dir, field, "*.vtu")))
    assert vtus, f"no .vtu files for field {field} under {output_dir}"
    tree = ET.parse(vtus[-1])
    root = tree.getroot()
    piece = root.find(".//Piece")
    pts = piece.find("Points/DataArray")
    xyz = np.fromstring(pts.text, sep=" ").reshape(-1, 3)
    conn = np.fromstring(
        piece.find("Cells/DataArray[@Name='connectivity']").text,
        sep=" ", dtype=int)
    tris = conn.reshape(-1, 3)
    da = piece.find("PointData/DataArray")
    vals = np.fromstring(da.text, sep=" ")
    ncomp = int(da.get("NumberOfComponents", "1"))
    if ncomp > 1:
        vals = np.linalg.norm(vals.reshape(-1, ncomp), axis=1)
    fig, ax = plt.subplots(figsize=(8, 5))
    tp = ax.tripcolor(xyz[:, 0], xyz[:, 1], tris, vals, shading="gouraud")
    fig.colorbar(tp, ax=ax, label=da.get("Name", field))
    ax.set_aspect("equal")
    out = os.path.join(output_dir, f"{field}_latest.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(f"wrote {out} from {vtus[-1]}")


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("output_dir")
    p.add_argument("state_file", nargs="?", help="ParaView .pvsm state")
    p.add_argument("-r", "--regenerate", action="store_true",
                   help="regenerate .pvd indices first")
    p.add_argument("-f", "--first", type=int, default=0)
    p.add_argument("-l", "--last", type=int, default=None)
    p.add_argument("--plot", metavar="FIELD",
                   help="matplotlib quick-look instead of ParaView")
    args = p.parse_args()
    if args.regenerate:
        regenerate_pvd(args.output_dir, args.first, args.last)
    if args.plot:
        quick_plot(args.output_dir, args.plot)
        return
    if args.state_file:
        try:
            subprocess.run(["paraview", f"--state={args.state_file}"],
                           cwd=args.output_dir, check=True)
        except FileNotFoundError:
            print("paraview not found; use --plot FIELD for a "
                  "matplotlib quick-look", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
