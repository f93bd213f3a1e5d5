"""Locate an importable xplane_pb2 (the jax.profiler trace proto).

The xplane proto ships in several packages depending on the environment;
this container's tensorboard_plugin_profile lacks it but a generated
module exists inside the uv wheel cache. Resolution order:
  1. tensorboard_plugin_profile.protobuf.xplane_pb2
  2. tensorflow.tsl.profiler.protobuf.xplane_pb2 (installed TF)
  3. any xplane_pb2.py under ~/.cache/uv (generated standalone module,
     loaded by path)
"""

import glob
import importlib.util
import os


def load_xplane_pb2():
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
        return xplane_pb2
    except ImportError:
        pass
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
        return xplane_pb2
    except ImportError:
        pass
    for pat in (os.path.expanduser(
                    "~/.cache/uv/**/tsl/profiler/protobuf/xplane_pb2.py"),
                "/opt/**/tsl/profiler/protobuf/xplane_pb2.py"):
        hits = glob.glob(pat, recursive=True)
        if hits:
            spec = importlib.util.spec_from_file_location("xplane_pb2",
                                                          hits[0])
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod
    raise ImportError("no xplane_pb2 found (tensorboard_plugin_profile, "
                      "tensorflow, or uv cache)")
