"""Sweep dispatch backends for the experiment runner (cache/__init__.py) —
the reference's ``cache_io.run_exps(..., enable_dispatch="slurm")`` surface
(scripts/trte_dncnn/train.py:42, instances_adapt.py:516): farm out one config
per job, with the uuid-keyed cache providing cross-job skip-done/resume.

Backends:
- "slurm": one ``sbatch`` submission per pending experiment (requires the
  ``sbatch`` binary; job writes its result into the shared cache dir, so any
  host sharing the filesystem participates);
- "process": a bounded local process pool — the single-host analogue, also
  the automatic fallback when sbatch is unavailable.

The worker re-imports the run function by spec ("module::qualname", or
"/path/to/file.py::qualname" for __main__ scripts), executes the config, and
writes the cache entry itself.
"""

from __future__ import annotations

import os
import pickle
import shlex
import shutil
import subprocess
import sys
import time
from pathlib import Path


def fn_spec(run_fn):
    """Importable spec for a function: module::qualname, or file::qualname
    for functions defined in a __main__ script."""
    mod = run_fn.__module__
    if mod == "__main__":
        path = getattr(sys.modules.get("__main__"), "__file__", None)
        if path is None:
            raise ValueError("cannot dispatch a __main__ function without a file")
        return f"{os.path.abspath(path)}::{run_fn.__qualname__}"
    return f"{mod}::{run_fn.__qualname__}"


def load_fn(spec):
    mod_part, qual = spec.split("::")
    if mod_part.endswith(".py"):
        import importlib.util

        name = Path(mod_part).stem
        s = importlib.util.spec_from_file_location(name, mod_part)
        module = importlib.util.module_from_spec(s)
        sys.modules.setdefault(name, module)
        s.loader.exec_module(module)
    else:
        import importlib

        module = importlib.import_module(mod_part)
    fn = module
    for part in qual.split("."):
        fn = getattr(fn, part)
    return fn


def write_job(pending_dir, uuid, cfg, spec, cache_dir):
    """Serialize one job description; returns its path."""
    pending_dir = Path(pending_dir)
    pending_dir.mkdir(parents=True, exist_ok=True)
    job = pending_dir / f"{uuid}.job.pkl"
    with open(job, "wb") as f:
        pickle.dump({"cfg": dict(cfg), "uuid": uuid, "fn_spec": spec,
                     "cache_dir": str(cache_dir)}, f)
    return job


def worker_main(job_path):
    """Entry point inside a dispatched job: run the config, write the cache."""
    with open(job_path, "rb") as f:
        job = pickle.load(f)
    from . import ExpCache, _to_plain
    from ..config import Config

    run_fn = load_fn(job["fn_spec"])
    cfg = Config(job["cfg"])
    cfg.uuid = job["uuid"]
    try:
        results = _to_plain(run_fn(cfg))
    except Exception:
        import traceback

        traceback.print_exc()
        results = {"error": traceback.format_exc()}
    ExpCache(job["cache_dir"]).write(job["uuid"], cfg, results)
    return 0


def _child_env():
    """Propagate the parent's sys.path so run functions from path-inserted
    modules (tests, notebook sessions) import inside dispatched jobs."""
    env = dict(os.environ)
    extra = [p for p in sys.path if p]
    env["PYTHONPATH"] = os.pathsep.join(
        extra + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
    return env


def _submit_slurm(job, slurm_opts):
    env = _child_env()
    script = (f"#!/bin/bash\n"
              f"export PYTHONPATH={shlex.quote(env['PYTHONPATH'])}\n"
              f"{shlex.quote(sys.executable)} -m frame2frame_tpu.cache.dispatch "
              f"{shlex.quote(str(job))}\n")
    sh = Path(str(job) + ".sh")
    sh.write_text(script)
    cmd = ["sbatch"] + list(slurm_opts or []) + [str(sh)]
    out = subprocess.run(cmd, capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"sbatch failed: {out.stderr}")
    return out.stdout.strip()


def dispatch(jobs, backend="process", nprocs=None, slurm_opts=None,
             poll_s=2.0, timeout_s=24 * 3600, verbose=True):
    """Run job files through the chosen backend; blocks until all cache
    entries exist (or a local worker fails hard)."""
    jobs = [Path(j) for j in jobs]
    if not jobs:
        return
    if backend == "slurm" and shutil.which("sbatch") is None:
        if verbose:
            print("[dispatch] sbatch not found; falling back to process pool")
        backend = "process"

    if backend == "slurm":
        for j in jobs:
            sid = _submit_slurm(j, slurm_opts)
            if verbose:
                print(f"[dispatch] {j.stem}: {sid}")
        _wait_for_cache(jobs, poll_s, timeout_s)
    elif backend == "process":
        from concurrent.futures import ProcessPoolExecutor

        nprocs = nprocs or max(os.cpu_count() // 2, 1)
        ok_jobs = []
        with ProcessPoolExecutor(max_workers=nprocs) as pool:
            futs = [pool.submit(_run_job_subprocess, str(j)) for j in jobs]
            for j, fu in zip(jobs, futs):
                rc = fu.result()
                if rc == 0:
                    ok_jobs.append(j)
                if verbose:
                    print(f"[dispatch] {j.stem}: rc={rc}")
        # keep the job pickles of failed runs so they can be inspected and
        # re-dispatched (mirrors _wait_for_cache keeping artifacts on timeout)
        _cleanup_jobs(ok_jobs)
    else:
        raise ValueError(f"unknown dispatch backend [{backend}]")


def _run_job_subprocess(job_path):
    """Isolate each experiment in its own interpreter (fresh JAX runtime)."""
    out = subprocess.run(
        [sys.executable, "-m", "frame2frame_tpu.cache.dispatch", job_path],
        env=_child_env())
    return out.returncode


def _wait_for_cache(jobs, poll_s, timeout_s):
    # the (job -> target cache file) mapping is static: read each job pickle
    # once up front instead of on every poll
    targets = {}
    for j in jobs:
        with open(j, "rb") as f:
            meta = pickle.load(f)
        targets[j] = Path(meta["cache_dir"]) / f"{meta['uuid']}.pkl"
    t0 = time.time()
    remaining = set(jobs)
    while remaining and time.time() - t0 < timeout_s:
        done = {j for j in remaining if targets[j].exists()}
        remaining -= done
        if remaining:
            time.sleep(poll_s)
    if remaining:
        raise TimeoutError(f"{len(remaining)} dispatched jobs never completed")
    _cleanup_jobs(jobs)


def _cleanup_jobs(jobs):
    """Remove consumed job artifacts (*.job.pkl and the slurm *.sh shim) so
    repeated sweeps don't accumulate stale pickles under <cache>/pending."""
    for j in jobs:
        for p in (Path(j), Path(str(j) + ".sh")):
            try:
                p.unlink()
            except OSError:
                pass


if __name__ == "__main__":
    sys.exit(worker_main(sys.argv[1]))
