#!/usr/bin/env python
"""Fetch published reference checkpoints into the local weights cache.

The counterpart of the reference's load_state_dict_from_url calls
(ssd_mobilenetv3.py:221-226, ssd_vgg16.py:207-212, mobilenetv2.py:213-216):
run this on a machine WITH network egress, then copy the cache dir
(~/.cache/demonet_tpu/weights, or $DEMONET_WEIGHTS_DIR) to the TPU host.

    python tools/fetch_weights.py ssdlite320_mobilenet_v3_large
    python tools/fetch_weights.py --all
    python tools/fetch_weights.py --print-urls   # no network needed
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demonet_tpu.utils.pretrained import (  # noqa: E402
    PRETRAINED_URLS, cached_weights_path, weights_cache_dir)


def fetch(name: str) -> None:
    url = PRETRAINED_URLS[name]
    dest = cached_weights_path(name)
    if os.path.isfile(dest):
        print(f"{name}: already cached at {dest}")
        return
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    print(f"{name}: {url} -> {dest}")
    try:
        urllib.request.urlretrieve(url, tmp)
    except OSError as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise SystemExit(
            f"download failed ({e}); this host may have no egress — run "
            f"this script on a connected machine and copy "
            f"{weights_cache_dir()} over.")
    os.replace(tmp, dest)
    print(f"{name}: done ({os.path.getsize(dest) / 1e6:.1f} MB)")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("models", nargs="*", choices=list(PRETRAINED_URLS) + [[]],
                   help="model names to fetch")
    p.add_argument("--all", action="store_true")
    p.add_argument("--print-urls", action="store_true",
                   help="print the name -> URL table and exit")
    args = p.parse_args()

    if args.print_urls:
        for name, url in PRETRAINED_URLS.items():
            print(f"{name}\t{url}")
        return
    names = list(PRETRAINED_URLS) if args.all else args.models
    if not names:
        p.error("give model names, --all, or --print-urls")
    for name in names:
        fetch(name)


if __name__ == "__main__":
    main()
