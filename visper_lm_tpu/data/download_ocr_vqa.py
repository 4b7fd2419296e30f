"""OCR-VQA dataset fetcher (reference datasets/ocr_vqa/loadDataset.py parity).

Downloads the images referenced by the OCR-VQA dataset JSON (requires network; in
offline environments point --dataset-json at a pre-downloaded copy and this script
only verifies/reports coverage)."""

from __future__ import annotations

import argparse
import json
import os
import urllib.request


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset-json", required=True, help="OCR-VQA dataset.json")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--verify-only", action="store_true")
    args = p.parse_args()

    data = json.load(open(args.dataset_json))
    os.makedirs(args.output_dir, exist_ok=True)
    n_ok, n_missing = 0, 0
    items = list(data.items())[: args.limit or len(data)]
    for key, rec in items:
        url = rec["imageURL"]
        ext = os.path.splitext(url)[1] or ".jpg"
        path = os.path.join(args.output_dir, key + ext)
        if os.path.exists(path):
            n_ok += 1
            continue
        if args.verify_only:
            n_missing += 1
            continue
        try:
            urllib.request.urlretrieve(url, path)
            n_ok += 1
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"failed {key}: {e}")
            n_missing += 1
    print(f"images present: {n_ok}, missing/failed: {n_missing}")


if __name__ == "__main__":
    main()
