"""Small host utilities (reference tools/common.py)."""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def save_args(args, save_path):
    with open(save_path, "w") as f:
        json.dump({k: str(v) for k, v in vars(args).items()}, f, indent=2)


def load_args(args, save_path):
    with open(save_path) as f:
        args.__dict__.update(json.load(f))
    return args


def model_size(params) -> int:
    """Total parameter count of a pytree (reference common.py `model_size`)."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)
               if hasattr(x, "shape"))


def map_tensor(input_, func):
    if isinstance(input_, (str, bytes)):
        return input_
    if isinstance(input_, dict):
        return {k: map_tensor(v, func) for k, v in input_.items()}
    if isinstance(input_, (list, tuple)):
        return type(input_)(map_tensor(v, func) for v in input_)
    return func(input_)
