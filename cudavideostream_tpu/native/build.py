"""CLI: build the native helper library.

``python -m cudavideostream_tpu.native.build``
"""

import sys

from cudavideostream_tpu.native import _SO, build_library

if __name__ == "__main__":
    ok = build_library(verbose=True)
    print(f"{'built' if ok else 'FAILED to build'} {_SO}")
    sys.exit(0 if ok else 1)
