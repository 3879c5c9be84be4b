"""Build the native extensions in-place:  python -m nightmare_rl_tpu.native.build"""

import os
import subprocess
import sys
import sysconfig


def build() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "ringlog.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(here, "_ringlog" + suffix)
    include = sysconfig.get_paths()["include"]
    cmd = [
        "gcc", "-O2", "-shared", "-fPIC", f"-I{include}", src, "-o", out,
    ]
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    print(build())
