"""Convert reference PyTorch CM3P checkpoints to cm3p_tpu param pytrees.

Thin CLI over :mod:`cm3p_tpu.interop.hf_import` (the mapping lives in the
package so ``inference.load_pretrained`` can auto-detect HF-layout dirs).

Usage:
    python tools/convert_reference_checkpoint.py --checkpoint <hf dir or .safetensors> --output out_dir
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cm3p_tpu.interop.hf_import import (  # noqa: E402,F401  (re-exported API)
    convert_cm3p_state_dict,
    hf_config_to_cm3p,
    load_hf_checkpoint,
    load_torch_state,
)

logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", required=True)
    ns = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    state = load_torch_state(ns.checkpoint)
    params = convert_cm3p_state_dict(state)
    n = sum(v.size for v in _leaves(params))
    logger.info("Converted %d parameters", n)

    from cm3p_tpu.train.checkpoint import save_model

    save_model(ns.output, params)
    logger.info("Saved to %s", ns.output)


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
