"""Convert a reference UnboundedNeRFPytorch checkpoint to native format.

Migration entry point for reference users
(``FourierGrid_ckpt_manager.py:44-51`` torch ``.tar`` →
``utils/checkpoint.py`` directory):

  python tools/import_reference_ckpt.py logs/garden/fine_last.tar \\
      --out logs/garden/imported [--stepsize 0.5] [--t_boundary 2.0]

The output directory then works everywhere a native checkpoint does:
``--program render --ft_path <out>``, ``tools/serve.py --ckpt <out>``,
``--program export_baked``, or as the implicit-resume state for fine-tuning.
"""

from __future__ import annotations

import argparse
import os as _os
import sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# conversion is pure host-side tensor shuffling (torch -> numpy -> msgpack);
# claiming an accelerator for it is pure downside, so pin the CPU platform
# before jax is imported (must be a hard assignment: site init may have
# pre-set an accelerator platform)
_os.environ["JAX_PLATFORMS"] = "cpu"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Import a reference .tar checkpoint into native format"
    )
    ap.add_argument("tar", help="reference checkpoint (e.g. fine_last.tar)")
    ap.add_argument("--out", required=True, help="output checkpoint directory")
    ap.add_argument(
        "--family",
        choices=["dvgo", "dcvgo", "dmpigo", "FourierGrid"],
        help="override model-family auto-detection",
    )
    ap.add_argument(
        "--stepsize", type=float,
        help="render stepsize (a config value, not stored in reference ckpts)",
    )
    ap.add_argument(
        "--t_boundary", type=float,
        help="FourierGrid inner/outer sampling boundary (1.5 waymo, 2.0 else)",
    )
    args = ap.parse_args(argv)

    from unboundednerfpytorch_tpu.utils.reference_import import import_checkpoint

    overrides = {}
    if args.stepsize is not None:
        overrides["stepsize"] = args.stepsize
    if args.t_boundary is not None:
        overrides["t_boundary"] = args.t_boundary

    family, cfg, params, step = import_checkpoint(
        args.tar, out_dir=args.out, family=args.family, overrides=overrides
    )
    import jax

    n_params = sum(
        int(x.size) for x in jax.tree.leaves(params) if hasattr(x, "size")
    )
    print(
        f"imported {family} checkpoint (step {step}, {n_params:,} param "
        f"elements) -> {args.out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
