#!/usr/bin/env python
"""Seed the per-device autotune cache from a committed seed file.

The autotune cache (``~/.cache/lorastencil_tpu/autotune.json``, or
``$LORASTENCIL_CACHE/autotune.json``) is keyed per device kind;
``benchmarks/autotune_seed_v5e.json`` holds the measured winners for
every BASELINE config on TPU v5-lite (round-5 reseed, cache version
v3), so a fresh machine gets cache hits for ``--autotune`` without
re-measuring:

    python tools/seed_autotune.py [seed.json]

Existing cache entries win over seed entries (the local machine's own
measurements are fresher).  Runs entirely on the host -- no device
attach.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DEFAULT_SEED = os.path.join(REPO, "benchmarks", "autotune_seed_v5e.json")


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    seed_path = argv[0] if argv else DEFAULT_SEED
    with open(seed_path) as f:
        seed = json.load(f)

    # import for the cache-path helpers only; autotune touches no
    # backend at import time
    from lorastencil_tpu.utils import autotune

    cache = autotune._load_cache()
    added = 0
    for key, val in seed.items():
        if key not in cache:
            cache[key] = val
            added += 1
    autotune._store_cache(cache)
    print(f"seeded {added} new entries ({len(seed) - added} already "
          f"present) -> {autotune._cache_path()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
