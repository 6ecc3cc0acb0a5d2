"""Export a native checkpoint as a reference-format torch ``.tar``.

The reverse of tools/import_reference_ckpt.py — lets a model trained here be
loaded by the reference framework's own tooling
(``FourierGrid/utils.py::load_model`` strict ``load_state_dict``):

  python tools/export_reference_ckpt.py logs/garden/fine_last \\
      --out logs/garden/fine_last.tar
"""

from __future__ import annotations

import argparse
import os as _os
import sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# host-side tensor shuffling only — never claim an accelerator for it
_os.environ["JAX_PLATFORMS"] = "cpu"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Export a native checkpoint to reference .tar format"
    )
    ap.add_argument("ckpt", help="native checkpoint directory (meta.json + msgpack)")
    ap.add_argument("--out", required=True, help="output .tar path")
    args = ap.parse_args(argv)

    from unboundednerfpytorch_tpu.utils.reference_import import export_checkpoint

    ref = export_checkpoint(args.ckpt, args.out)
    n = sum(int(v.numel()) for v in ref["model_state_dict"].values())
    print(
        f"exported step {ref['global_step']} ({n:,} tensor elements, "
        f"{len(ref['model_state_dict'])} entries) -> {args.out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
