"""Label preprocessing CLI — reference preprocess.py: SPEED+ JSON labels ->
per-model CSV (keypoint projection + tight bbox; SPN attitude-class bins).
Same private argparse surface (preprocess.py:44-57)."""
from __future__ import annotations

import argparse

from speedplusbaseline_tpu.data.preprocess import json2csv


def build_parser():
    parser = argparse.ArgumentParser("Generating CSV files")
    parser.add_argument("--projroot", type=str, default=".")
    parser.add_argument("--dataroot", type=str, default="datasets")
    parser.add_argument("--dataname", type=str, default="speedplus")
    parser.add_argument("--model_name", type=str, default="krn")
    parser.add_argument("--num_keypoints", type=int, default=11)
    parser.add_argument("--num_neighbors", type=int, default=5)
    parser.add_argument("--keypts_3d_model", type=str,
                        default="src/utils/tangoPoints.mat")
    parser.add_argument("--attitude_class", type=str,
                        default="src/utils/attitudeClasses.mat")
    parser.add_argument("--domain", type=str, default="synthetic")
    parser.add_argument("--jsonfile", type=str, default="train.json")
    parser.add_argument("--csvfile", type=str, default="splits_krn/train.csv")
    return parser


def main(argv=None):
    cfg = build_parser().parse_args(argv)
    out = json2csv(
        dataroot=cfg.dataroot,
        dataname=cfg.dataname,
        domain=cfg.domain,
        jsonfile=cfg.jsonfile,
        csvfile=cfg.csvfile,
        model_name=cfg.model_name,
        num_keypoints=cfg.num_keypoints,
        num_neighbors=cfg.num_neighbors,
        keypts_3d_model=cfg.keypts_3d_model,
        attitude_class=cfg.attitude_class,
    )
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
