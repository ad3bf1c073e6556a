"""Small CLI helpers (reference utils/types.py equivalent; to_cuda is
meaningless on TPU — device placement is handled by jit/sharding)."""

import argparse


def str2bool(v: str) -> bool:
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")
