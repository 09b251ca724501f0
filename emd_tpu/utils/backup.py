"""Run provenance: code/config backup into the output directory.

Re-creation of the reference's run-reproducibility utilities
(OmniRe/utils/misc.py export_points_to_xyz/... and tools/train.py's
config dump + code backup): every training run records the resolved
config, the git state, and a source snapshot so any artifact can be
traced to the exact code that produced it.
"""
from __future__ import annotations

import json
import os
import subprocess
import zipfile


def import_object(path: str):
    """Resolve "pkg.module:attr" (or "pkg.module.attr") to the object —
    the reference's `import_str` config-driven class registry
    (OmniRe/utils/misc.py import_str)."""
    if ":" in path:
        mod, attr = path.split(":", 1)
    else:
        mod, _, attr = path.rpartition(".")
    import importlib

    m = importlib.import_module(mod)
    obj = m
    for part in attr.split("."):
        obj = getattr(obj, part)
    return obj


def _git(repo: str, *args: str) -> str:
    try:
        return subprocess.run(
            ["git", "-C", repo, *args], capture_output=True, text=True,
            timeout=10).stdout.strip()
    except Exception:
        return ""


def backup_run(out_dir: str, config: dict | None = None,
               repo_root: str | None = None,
               code_snapshot: bool = True) -> None:
    """Write config.json, git_state.json and (optionally) a zip of the
    package source into `out_dir/backup/`."""
    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    bdir = os.path.join(out_dir, "backup")
    os.makedirs(bdir, exist_ok=True)

    if config is not None:
        with open(os.path.join(bdir, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)

    git_state = dict(
        commit=_git(root, "rev-parse", "HEAD"),
        branch=_git(root, "rev-parse", "--abbrev-ref", "HEAD"),
        dirty=bool(_git(root, "status", "--porcelain")),
    )
    with open(os.path.join(bdir, "git_state.json"), "w") as f:
        json.dump(git_state, f, indent=2)

    if code_snapshot:
        pkg = os.path.join(root, "emd_tpu")
        zpath = os.path.join(bdir, "code.zip")
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            for dirpath, _, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith((".py", ".cpp", ".h")):
                        p = os.path.join(dirpath, fn)
                        z.write(p, os.path.relpath(p, root))
