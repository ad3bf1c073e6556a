"""Small CLI helpers (reference utils/types.py equivalent; to_cuda is
meaningless on TPU — device placement is handled by jit/sharding)."""

import argparse


_BOOL_WORDS = {
    "yes": True, "true": True, "t": True, "y": True, "1": True,
    "no": False, "false": False, "f": False, "n": False, "0": False,
}


def str2bool(v: str) -> bool:
    try:
        return _BOOL_WORDS[v.strip().lower()]
    except KeyError:
        raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")
