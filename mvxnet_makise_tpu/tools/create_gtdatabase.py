"""GT-database build CLI.

Counterpart of /root/reference/create_gtdatabase.py (SURVEY.md §2 C6):
``python -m mvxnet_makise_tpu.tools.create_gtdatabase <dataroot>
[--kins-json PATH]``.  Without --kins-json the builder falls back to
rectangular masks from the KITTI 2D boxes (the reference hard-requires
the KINS annotation file at ./seglabel/update_train_2020.json).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dataroot")
    p.add_argument("--kins-json", default=None,
                   help="KINS update_train_2020.json path; omit for "
                        "rectangular-mask mode")
    p.add_argument("--classes", nargs="+",
                   default=["Car", "Pedestrian", "Cyclist"])
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from mvxnet_makise_tpu.config import load_config
    from mvxnet_makise_tpu.data.gt_database import build_database

    cfg = load_config(None, data_root=args.dataroot)
    counts = build_database(args.dataroot, cfg, kins_json=args.kins_json,
                            classes=tuple(args.classes), limit=args.limit)
    print("gt database built:", counts)
    return 0


if __name__ == "__main__":
    sys.exit(main())
