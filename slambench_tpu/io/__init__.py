"""Dataset I/O: the packed RAW container, depth readers with real-time
frame pacing, converters, and a synthetic ground-truth scene generator.

TPU-native equivalents of the reference's dataset layer
(reference: kfusion/include/interface.h, kfusion/thirdparty/scene2raw.cpp).
The synthetic generator replaces the reference's wget-based ICL-NUIM
download (reference: Makefile:37-43) in network-less environments while
producing the same on-disk formats.
"""

from slambench_tpu.io.raw import RawWriter, read_raw_frame, raw_frame_count
from slambench_tpu.io.readers import (
    DepthReader, RawDepthReader, SceneDepthReader, make_reader,
)
from slambench_tpu.io.synthetic import SyntheticScene, generate_dataset
