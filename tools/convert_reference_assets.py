"""One-time conversion of public model/data assets into this package's formats.

Usage: python tools/convert_reference_assets.py <guidemaker-data-dir>

Converts:
* ``V3_model_nopos.onnx`` (Doench 2016 gradient-boosted trees, BSD-3 Azimuth
  derivative) -> ``doench_v3_trees.npz`` dense arrays for the JAX evaluator;
* ``cfd_data.json`` (published CFD mismatch/PAM weight tables from Doench
  et al. 2016 supplementary data) -> re-serialized as our data asset.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from guidemaker_tpu.definitions import DATA_DIR
from guidemaker_tpu.score.onnx_tree import TreeEnsemble, parse_tree_ensemble


def main(src_dir: str) -> None:
    os.makedirs(DATA_DIR, exist_ok=True)

    onnx_path = os.path.join(src_dir, "V3_model_nopos.onnx")
    ens = TreeEnsemble.from_attrs(parse_tree_ensemble(onnx_path))
    out = os.path.join(DATA_DIR, "doench_v3_trees.npz")
    ens.save_npz(out)
    print(f"wrote {out}: {ens.feature.shape[0]} trees, depth {ens.max_depth}, "
          f"base {ens.base_value}")

    with open(os.path.join(src_dir, "cfd_data.json")) as f:
        cfd = json.load(f)
    out = os.path.join(DATA_DIR, "cfd_data.json")
    with open(out, "w") as f:
        json.dump(cfd, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {len(cfd['mm'])} mm weights, {len(cfd['pam'])} pam")

    with open(os.path.join(src_dir, "V3_model_nopos_options.json")) as f:
        opts = json.load(f)
    out = os.path.join(DATA_DIR, "doench_v3_options.json")
    with open(out, "w") as f:
        json.dump(opts, f, indent=1, sort_keys=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1])
