"""OpenNI recording (.oni) -> RAW converter: capability stub.

The reference ships ``oni2raw`` (reference: kfusion/thirdparty/
oni2raw.cpp) to convert Kinect OpenNI recordings into the packed RAW
container. TPU hosts have no OpenNI driver stack and no camera, so this
entry point exists to document the capability boundary and to convert
the intermediate format that OpenNI tooling CAN produce everywhere:
a directory of per-frame ``.npy``/``.png`` depth dumps (millimetre
uint16), which many openni2-python export scripts emit.

CLI: python -m slambench_tpu.tools.oni2raw <dump_dir> <out.raw>
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

from slambench_tpu.io.raw import RawWriter


def convert(dump_dir: str, out_path: str) -> int:
    files = sorted(
        f for f in os.listdir(dump_dir)
        if re.match(r".*\.(npy|png)$", f))
    if not files:
        print("no .npy/.png depth frames found (for native .oni files, "
              "export frames with an OpenNI-enabled host first)",
              file=sys.stderr)
        return 0
    writer = None
    n = 0
    for f in files:
        path = os.path.join(dump_dir, f)
        if f.endswith(".npy"):
            depth = np.load(path)
        else:
            from PIL import Image
            depth = np.asarray(Image.open(path))
        depth = np.asarray(depth, np.uint16)
        if writer is None:
            h, w = depth.shape
            writer = RawWriter(out_path, w, h)
        writer.write(depth)
        n += 1
    if writer:
        writer.close()
    print(f"wrote {n} frames to {out_path}", file=sys.stderr)
    return n


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print("usage: oni2raw <dump_dir> <out.raw>", file=sys.stderr)
        return 1
    return 0 if convert(argv[0], argv[1]) > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
