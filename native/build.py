#!/usr/bin/env python
"""Build the native extensions in-place.

Usage:  python native/build.py
Produces native/hpob_native.<abi>.so; aline_tpu.tasks.hpob_native falls
back to the pure-Python json path when the extension is absent.
"""
import os
import subprocess
import sys
import sysconfig


def build():
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "hpob_loader.cpp")
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(here, f"hpob_native{ext_suffix}")
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", out,
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")
    return out


if __name__ == "__main__":
    build()
