"""Native host-runtime components (C++, built on demand with g++).

`fastload` is the proof-ingest fast path: Plonky2 JSON -> flattened uint64
batch arrays, ~an order of magnitude over the Python json/dataclass path
and GIL-free during parse so thread pools scale it across host cores
(tools/bench_ingest.py for measured numbers). Falls back cleanly to the
pure-Python path when no toolchain is available: `get_fastload()` returns
None and callers use compiler.flatten.flatten_proofs instead.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")
_LOCK = threading.Lock()
_CACHED = False
_MOD = None


def _so_path() -> str:
    return os.path.join(_BUILD, "p2v_fastload" + (sysconfig.get_config_var("EXT_SUFFIX") or ".so"))


def build(force: bool = False) -> Optional[str]:
    """Compile the extension if needed; returns the .so path or None."""
    so = _so_path()
    src = os.path.join(_DIR, "fastload.cpp")
    if not force and os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    os.makedirs(_BUILD, exist_ok=True)
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", src, "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except Exception:
        return None
    return so


def get_fastload():
    """The loaded extension module, building it on first use; None if the
    toolchain or build is unavailable (callers fall back to Python)."""
    global _CACHED, _MOD
    with _LOCK:
        if _CACHED:
            return _MOD
        _CACHED = True
        so = build()
        if so is None:
            return None
        import importlib.util

        spec = importlib.util.spec_from_file_location("p2v_fastload", so)
        try:
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        except Exception:
            return None
        _MOD = mod
        return _MOD


def shape_descriptor(tpl) -> dict:
    """The template's shape facts the native flattener needs."""
    return {
        "n_pi": tpl.n_pi,
        "cap_len": tpl.cap_len,
        "n_const_cols": tpl.n_const_cols,
        "n_sigmas": tpl.n_sigmas,
        "num_wires": tpl.num_wires,
        "n_zs": tpl.n_zs,
        "n_pp": tpl.n_pp,
        "n_quot": tpl.n_quot,
        "n_lookup": tpl.n_lookup,
        "final_poly_len": tpl.final_poly_len,
        "num_queries": tpl.num_queries,
        "initial_path_len": tpl.initial_path_len,
        "oracle_widths": [int(w) for w in tpl.oracle_widths],
        "steps": [
            {
                "arity": 1 << st["arity_bits"],
                "path_len": st["path_len"],
                "cap_len": st["cap_len"],
            }
            for st in tpl.steps
        ],
    }


def alloc_batch_arrays(tpl, batch: int) -> Dict[str, np.ndarray]:
    """Batch arrays in compiler/flatten.py's exact layout."""
    out = {
        "circuit_digest": (batch, 4),
        "public_inputs": (batch, tpl.n_pi),
        "cap_cs": (batch, tpl.cap_len, 4),
        "cap_w": (batch, tpl.cap_len, 4),
        "cap_zp": (batch, tpl.cap_len, 4),
        "cap_q": (batch, tpl.cap_len, 4),
        "openings1": (batch, tpl.n_const_cols + tpl.n_sigmas + tpl.num_wires + tpl.n_zs + tpl.n_pp + tpl.n_quot + tpl.n_lookup, 2),
        "openings2": (batch, tpl.n_zs + tpl.n_lookup, 2),
        "final_poly": (batch, tpl.final_poly_len, 2),
        "pow_witness": (batch,),
    }
    for o in range(4):
        out[f"leaves_{o}"] = (batch, tpl.num_queries, tpl.oracle_widths[o])
        out[f"sibs_{o}"] = (batch, tpl.num_queries, tpl.initial_path_len, 4)
    for s, st in enumerate(tpl.steps):
        out[f"step_cap_{s}"] = (batch, st["cap_len"], 4)
        out[f"step_evals_{s}"] = (batch, tpl.num_queries, 1 << st["arity_bits"], 2)
        out[f"step_sibs_{s}"] = (batch, tpl.num_queries, st["path_len"], 4)
    return {k: np.zeros(shape, dtype=np.uint64) for k, shape in out.items()}


def flatten_proof_jsons(
    tpl,
    pairs: Sequence[Tuple[bytes, bytes]],
    workers: int = 0,
) -> Dict[str, np.ndarray]:
    """Native counterpart of compiler.flatten.flatten_proofs taking raw
    (vkey_json, proof_json) byte pairs. `workers` > 1 parses rows on a
    thread pool (the extension drops the GIL during parse+fill)."""
    mod = get_fastload()
    if mod is None:
        raise RuntimeError("native fastload unavailable (no toolchain?)")
    shape = shape_descriptor(tpl)
    out = alloc_batch_arrays(tpl, len(pairs))

    def one(i: int):
        vk, pf = pairs[i]
        mod.flatten_into(shape, out, i, vk, pf)

    if workers and workers > 1 and len(pairs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(one, range(len(pairs))))
    else:
        for i in range(len(pairs)):
            one(i)
    return out
