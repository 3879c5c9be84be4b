"""Native host-side components (C extensions), with build-on-demand.

Currently: ``_ringlog`` — the mmap trajectory ring buffer used by
utils.binlog.  ``get_ringlog()`` imports it, building in-place with gcc on
first use if the shared object is missing.
"""

from __future__ import annotations


def get_ringlog():
    try:
        from nightmare_rl_tpu.native import _ringlog  # type: ignore
        return _ringlog
    except ImportError:
        from nightmare_rl_tpu.native.build import build

        build()
        from nightmare_rl_tpu.native import _ringlog  # type: ignore
        return _ringlog
