"""Import raw Prophesee recordings into a training-ready dataset.

Voxelizes `.dat`/`.npy` event recordings (+`<name>_bbox.npy` labels)
into the pre-voxelized layout every loader in this framework reads,
using the on-device XLA scatter-add voxelizer. See
leod_tpu/data/import_raw.py for the format contract.

    # Gen1 (304x240), histograms at full resolution
    python cli/import_raw.py --raw-dir ~/gen1/train_raw --out ~/gen1_ds \
        --split train

    # 1Mpx (1280x720), _ds2_nearest layout + 7->3 class remap
    python cli/import_raw.py --raw-dir ~/1mpx/train_raw --out ~/1mpx_ds \
        --split train --height 720 --width 1280 --ds2 \
        --class-map 0:0,1:1,2:2
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--raw-dir", required=True,
                    help="directory of raw recordings (events + _bbox.npy)")
    ap.add_argument("--out", required=True, help="dataset root to write")
    ap.add_argument("--split", default="train",
                    choices=("train", "val", "test"))
    ap.add_argument("--height", type=int, default=240,
                    help="sensor height (overridden by .dat headers)")
    ap.add_argument("--width", type=int, default=304)
    ap.add_argument("--bins", type=int, default=10)
    ap.add_argument("--dt-ms", type=int, default=50)
    ap.add_argument("--ds2", action="store_true",
                    help="write the _ds2_nearest half-resolution layout "
                         "(1Mpx convention); labels stay full-res")
    ap.add_argument("--batch", type=int, default=16,
                    help="windows voxelized per device call")
    ap.add_argument("--class-map", default=None,
                    help="raw->dataset class remap, e.g. 0:0,1:1,2:2 "
                         "(unmapped classes are dropped)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from leod_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from leod_tpu.data.import_raw import _parse_class_map, import_split

    n = import_split(args.raw_dir, args.out, args.split,
                     height=args.height, width=args.width, bins=args.bins,
                     dt_us=args.dt_ms * 1000, ds2=args.ds2,
                     batch=args.batch,
                     class_map=_parse_class_map(args.class_map))
    print(f"imported {n} sequences into {args.out}/{args.split}")


if __name__ == "__main__":
    main()
