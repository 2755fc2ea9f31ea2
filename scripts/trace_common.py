"""Shared helpers for on-box jax.profiler trace capture + xprof parsing.

NOTE: tensorboard_plugin_profile's converter has a broken protobuf import on
this box; xprof's converter is the working one.
"""

import glob
import json
import os
import shutil


def fresh_logdir(path: str) -> str:
    shutil.rmtree(path, ignore_errors=True)  # one trace per run
    return path


def parse_trace(logdir: str, out_prefix: str, tools=("hlo_stats",)):
    """Find the run's xplane protos and dump each requested xprof tool's JSON
    to ``{out_prefix}_{tool}.json``. Returns the list of written paths."""
    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print(f"xplane files: {xplanes}", flush=True)
    if not xplanes:
        return []

    from xprof.convert import raw_to_tool_data

    written = []
    for tool in tools:
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, tool, {})
        except Exception as e:
            print(f"[{tool}] failed: {type(e).__name__}: {e}", flush=True)
            continue
        if isinstance(data, bytes):
            data = data.decode("utf-8", errors="replace")
        out = f"{out_prefix}_{tool}.json"
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print(f"[{tool}] -> {out} ({os.path.getsize(out)} bytes)", flush=True)
        written.append(out)
    return written
