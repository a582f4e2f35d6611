"""Step 4/5: deployment-grade LUT-retrieval evaluation.

Replaces the reference's 24-process NumPy fan-out (ref: sr/4_test_lut.py:257-259)
with the jitted integer cascade on the accelerator — per-image processes are
pointless when one chip runs the whole ensemble in a single fused program.
Also provides the single-image API surface of the fork's 5_test_lut.py
(ref: sr/5_test_lut.py:241-414) with its path bugs fixed.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ensemble import lut_cascade_int, prepare_expanded_luts_auto
from ..utils.imgio import load_image, save_image
from ..utils.lut_io import load_luts
from ..utils.metrics import modcrop, psnr_ssim_y


class LutEvaluator:
    """Holds device LUTs + a shape-cached jitted cascade.

    Uses the corner-expanded int8 engine (one gather per pixel per
    mode x rotation instead of five; see ops.simplex_tables.expand_lut) —
    bit-identical to the reference NumPy engine.
    """

    #: Default cap on input pixels per device dispatch (batch x Hb x Wb).
    #: The cascade's wide stages gather ~1 KB of corner bytes per input
    #: pixel, so ~8 M input pixels ~ 8 GB of HBM temporaries on a 16 GB
    #: chip.  Bucketed groups are chunked to stay under it; a single
    #: image above it requires `band > 0` (raised loudly otherwise).
    MAX_BATCH_PIXELS = 8_000_000

    def __init__(self, luts: dict, *, stages: int, modes: str, scale: int,
                 interval: int = 4, bucket: int = 0, band: int = 0,
                 max_batch_pixels: int | None = None, n_devices: int = 1,
                 kernel: bool | None = None):
        self.stages = stages
        self.modes = modes
        self.scale = scale
        self.interval = interval
        self.bucket = bucket
        self.band = band
        self.max_batch_pixels = max_batch_pixels or self.MAX_BATCH_PIXELS
        # Pallas tail-assembly kernel (ops.tail_kernel): fuses the final
        # stage's rotation un-shifts, stage mix, PixelShuffle interleave
        # and uint8 cast into one VMEM pass — bit-identical, ~15% faster
        # on TPU.  Auto-enabled where supported; banded/meshed paths and
        # non-TPU backends fall back to the pure-XLA cascade.
        from ..ops import tail_kernel as _tk

        if kernel is None:
            kernel = _tk.supports_tail_kernel(modes, scale, interval=interval)
        self.kernel = bool(kernel) and not band and n_devices <= 1
        self._tk = _tk
        # Batch-sharded eval over a 1-D device mesh (the reference's
        # DataParallel surface, ref: sr/1_train_model.py:141-142, extended
        # to step 4): tables replicated, bucketed batches sharded on the
        # leading axis — jit/GSPMD partitions the cascade; bit-identical.
        self.n_devices = max(1, min(n_devices, jax.device_count()))
        self.mesh = None
        if self.n_devices > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(self.n_devices)
        # Tables ride as jit ARGUMENTS (device buffers), not closure
        # constants — baked-in constants of this size blow remote-compile
        # request limits (and re-upload per compiled shape).  The host-side
        # expansion itself is disk-cached (minutes of build time per
        # construction otherwise).
        # Kernel-path table formats (bit-identical; defaults are the
        # measured v5e winners, PERF.md r3):
        #  * corner16_modes ("y"): non-symmetric final-stage modes use the
        #    (L**4, 16*v) shared 16-corner table — 21.4 MB, XLA pins it
        #    S(1) (VMEM) where gathers run ~1.9x faster per row;
        #  * fold16_modes ("sd"): symmetric final-stage modes keep the
        #    rotation fold but drop the 24x rank expansion — (L**4, 64*v)
        #    = 85.5 MB, also VMEM-staged (7.15 -> 3.7 ns/row), with the
        #    group-fold Pallas kernel absorbing the 16-corner contraction.
        #  * k128_stage1 ("sd"): symmetric INNER-stage modes re-lay their
        #    v == 1 folded table as (L**4, 128) int8 so the group-fold
        #    kernel contracts the gathered rows directly — deletes the
        #    XLA layout-copy/convert/multiply_reduce glue (~9 ms per
        #    8x1080p batch; the y variant measured slower and stays on
        #    the s32 XLA path).
        #  * int8_stage1 ("y"): non-symmetric INNER-stage modes keep
        #    their (L**4, 16) quad table int8 instead of the s32
        #    widening — the 1.3 MB table still gets VMEM-staged and the
        #    4x smaller gathered buffers shave the downstream layout
        #    copies (~2.6 ms per 8x1080p batch).
        # MULUT_CORNER16 / MULUT_FOLD16 / MULUT_K128 / MULUT_S1_INT8
        # override (e.g. "" reverts to the rank-expanded HBM tables /
        # stock stage-1 forms).
        import os

        c16 = os.environ.get("MULUT_CORNER16", "y") if self.kernel else ""
        f16 = os.environ.get("MULUT_FOLD16", "sd") if self.kernel else ""
        k1 = os.environ.get("MULUT_K128", "sd") if self.kernel else ""
        s18 = os.environ.get("MULUT_S1_INT8", "y") if self.kernel else ""
        tabs = prepare_expanded_luts_auto(
            luts, interval=interval, shared_quad=self.kernel,
            corner16_modes=c16, fold16_modes=f16, k128_stage1=k1,
            int8_stage1=s18,
        )
        if self.mesh is not None:
            from ..parallel.mesh import replicate_tree

            self.luts = replicate_tree(self.mesh, tabs)
        else:
            self.luts = jax.device_put(tabs)

        # Outputs leave the device as uint8: the cascade's int32 result is
        # already in [0, 255], and a device-side cast quarters the
        # device-to-host bytes (an 8K output is 1.6 GB as int32 — minutes
        # through a remote-device tunnel, seconds as uint8).
        @jax.jit
        def _run_tabs(tabs, img):
            if band:
                # large-image slab streaming (bounds HBM temporaries;
                # bit-identical — see ops.ensemble.lut_cascade_banded)
                from ..ops.ensemble import lut_cascade_banded

                out = lut_cascade_banded(
                    tabs, img, stages=stages, modes=modes, scale=scale,
                    interval=interval, expanded=True, band=band)
            else:
                out = lut_cascade_int(tabs, img, stages=stages,
                                      modes=modes, scale=scale,
                                      interval=interval, expanded=True)
            return out.astype(jnp.uint8)

        @jax.jit
        def _run_bucketed_tabs(tabs, img, h, w):
            if band:
                # band and bucket COMPOSE: each slab of the bucketed
                # buffer re-syncs its pad region with the slab-local
                # validity (bit-identical; see lut_cascade_banded).
                from ..ops.ensemble import lut_cascade_banded

                out = lut_cascade_banded(
                    tabs, img, stages=stages, modes=modes, scale=scale,
                    interval=interval, expanded=True, band=band,
                    valid_hw=(h, w))
            else:
                out = lut_cascade_int(tabs, img, stages=stages, modes=modes,
                                      scale=scale, interval=interval,
                                      expanded=True, valid_hw=(h, w))
            return out.astype(jnp.uint8)

        self._run = functools.partial(_run_tabs, self.luts)
        self._run_bucketed = functools.partial(_run_bucketed_tabs, self.luts)

        if self.kernel:
            from ..ops.tail_kernel import lut_cascade_packed
            from ..utils.xla_opts import tpu_compiler_options

            # MULUT_SCOPED_VMEM_KIB raises the scoped-VMEM budget for
            # these executables (VMEM-staged tables gather ~4.4x faster
            # per row; pairs with MULUT_CORNER16 tables — PERF.md r3).
            copts = tpu_compiler_options()

            @functools.partial(jax.jit, compiler_options=copts)
            def _runk_tabs(tabs, img):
                return lut_cascade_packed(
                    tabs, img, stages=stages, modes=modes, scale=scale,
                    interval=interval)

            @functools.partial(jax.jit, compiler_options=copts)
            def _runk_bucketed_tabs(tabs, img, h, w):
                return lut_cascade_packed(
                    tabs, img, stages=stages, modes=modes, scale=scale,
                    interval=interval, valid_hw=(h, w))

            self._runk = functools.partial(_runk_tabs, self.luts)
            self._runk_bucketed = functools.partial(
                _runk_bucketed_tabs, self.luts)

    def _exec(self, chw) -> np.ndarray:
        """One untiled dispatch -> host uint8 (..., H*scale, W*scale)."""
        if self.kernel:
            h, w = chw.shape[-2], chw.shape[-1]
            packed = self._runk(jnp.asarray(chw))
            return self._tk.unpack_u32(
                packed, chw.shape[:-2], h, w, self.scale)
        return np.asarray(self._run(jnp.asarray(chw)))

    def _exec_bucketed(self, buf, hs, ws) -> np.ndarray:
        """One bucketed dispatch -> host uint8 (..., Hb*scale, Wb*scale)."""
        if self.kernel:
            h, w = buf.shape[-2], buf.shape[-1]
            packed = self._runk_bucketed(
                jnp.asarray(buf), jnp.asarray(hs), jnp.asarray(ws))
            return self._tk.unpack_u32(
                packed, buf.shape[:-2], h, w, self.scale)
        return np.asarray(self._run_bucketed(
            jnp.asarray(buf), jnp.asarray(hs), jnp.asarray(ws)))

    @classmethod
    def from_folder(cls, lut_folder: str, *, stages: int = 2, modes: str = "sdy",
                    scale: int = 4, interval: int = 4, lut_name: str = "LUT_ft",
                    bucket: int = 0, band: int = 0, n_devices: int = 1):
        luts = load_luts(lut_folder, stages=stages, modes=modes, scale=scale,
                         interval=interval, name=lut_name)
        return cls(luts, stages=stages, modes=modes, scale=scale,
                   interval=interval, bucket=bucket, band=band,
                   n_devices=n_devices)

    def upscale(self, img_lr: np.ndarray) -> np.ndarray:
        """(H, W, C) or (H, W) uint8 LR -> upscaled uint8 SR (same rank).

        The cascade is channel-agnostic (channels ride the batch axis), so
        single-channel input — e.g. the luma plane of the YUV deployment
        mode (ref: sr/Test.py:317-398) — costs 1/3 of an RGB pass.

        With `bucket > 0`, images are evaluated in a (ceil to bucket)-sized
        buffer with the pad region clamp-synchronized on device — ONE
        compiled program per bucket shape serves every image size below it,
        with bit-identical output.
        """
        # ship uint8; the cascade casts to int32 on device (4x less H2D)
        if img_lr.ndim == 2:
            out = self.upscale(img_lr[:, :, None])
            return out[:, :, 0]
        chw = img_lr.transpose(2, 0, 1)
        if not self.bucket:
            self._check_untiled_size(*chw.shape[-2:], chw.shape[0])
            out = self._exec(chw)
            return out.transpose(1, 2, 0).astype(np.uint8)
        h, w = chw.shape[-2:]
        bucket = self.bucket
        hb = -(-h // bucket) * bucket
        wb = -(-w // bucket) * bucket
        self._check_untiled_size(hb, wb, chw.shape[0])
        buf = np.pad(chw, [(0, 0), (0, hb - h), (0, wb - w)], mode="edge")
        out = self._exec_bucketed(
            buf, np.int32(h), np.int32(w)
        )[:, : h * self.scale, : w * self.scale]
        return out.transpose(1, 2, 0).astype(np.uint8)

    def upscale_batch(self, imgs_lr: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, H*scale, W*scale, 3) uint8.

        Batched same-shape throughput path (the per-chip bench shape); for
        mixed sizes use `upscale` with a bucket.
        """
        out = self._exec(imgs_lr.transpose(0, 3, 1, 2))  # uint8 H2D
        return out.transpose(0, 2, 3, 1).astype(np.uint8)

    def upscale_many(self, imgs_lr: list) -> list:
        """Mixed-size batch: ONE compiled dispatch per bucket shape.

        Replaces the reference's Pool(24) per-image process fan-out
        (ref: sr/4_test_lut.py:257-259) with the chip's batch dimension:
        images are grouped by their bucket-padded shape, stacked, and run
        through the bucketed cascade with per-image valid (h, w) vectors
        (`ops.ensemble.clamp_pad_region` re-synchronizes each image's pad
        region on device).  Bit-identical to per-image `upscale`.

        Requires `bucket > 0` (same-shape groups would still batch, but
        mixed shapes need the bucket to share a program).
        """
        assert self.bucket, "upscale_many requires a bucket size"
        bucket, scale = self.bucket, self.scale
        groups: dict = {}
        for i, img in enumerate(imgs_lr):
            h, w = img.shape[:2]
            hb = -(-h // bucket) * bucket
            wb = -(-w // bucket) * bucket
            groups.setdefault((hb, wb), []).append(i)
        outs: list = [None] * len(imgs_lr)
        for (hb, wb), idxs in groups.items():
            self._check_untiled_size(hb, wb, 3)
            # Chunk the group so one dispatch never exceeds the HBM-safe
            # pixel cap (a dataset whose images all share a bucket shape
            # would otherwise stack into one unbounded batch).
            per = max(1, self.max_batch_pixels // (hb * wb * 3))
            for c0 in range(0, len(idxs), per):
                chunk = idxs[c0 : c0 + per]
                batch = np.stack([
                    np.pad(
                        imgs_lr[i].transpose(2, 0, 1),  # uint8 H2D
                        [(0, 0),
                         (0, hb - imgs_lr[i].shape[0]),
                         (0, wb - imgs_lr[i].shape[1])],
                        mode="edge",
                    )
                    for i in chunk
                ])
                hs = np.asarray(
                    [imgs_lr[i].shape[0] for i in chunk], np.int32
                )
                ws = np.asarray(
                    [imgs_lr[i].shape[1] for i in chunk], np.int32
                )
                out = self._dispatch_bucketed(batch, hs, ws)
                for k, i in enumerate(chunk):
                    h, w = imgs_lr[i].shape[:2]
                    outs[i] = (
                        out[k, :, : h * scale, : w * scale]
                        .transpose(1, 2, 0).astype(np.uint8)
                    )
        return outs

    def _dispatch_bucketed(self, batch: np.ndarray, hs: np.ndarray,
                           ws: np.ndarray) -> np.ndarray:
        """One bucketed device dispatch, batch-sharded over the mesh when
        n_devices > 1 (batch padded to a device multiple by repeating the
        last image; the replicas are cropped off — bit-identical)."""
        n = batch.shape[0]
        if self.mesh is None:
            return self._exec_bucketed(batch, hs, ws)
        from ..parallel.mesh import shard_batch

        pad = -n % self.n_devices
        if pad:
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
            hs = np.concatenate([hs, np.repeat(hs[-1:], pad)])
            ws = np.concatenate([ws, np.repeat(ws[-1:], pad)])
        b, h, w = shard_batch(self.mesh, batch, hs, ws)
        return np.asarray(self._run_bucketed(b, h, w))[:n]

    # ------------------------------------------------------------------
    # Fully on-device YUV deployment mode (ref: sr/Test.py:317-398).
    # The host path in sr/Test.py (PIL bicubic chroma, float64 color
    # transforms) pins quality; this fused program is the THROUGHPUT
    # form: RGB->YCbCr (one 3x3 matmul), the integer cascade on luma
    # only (1/3 of the cascade work), chroma bicubic as two dense
    # matmuls (ops.resize), YCbCr->RGB — one jit, uint8 in / uint8 out,
    # nothing touches the host between.  Chroma resize keeps f32 through
    # both axes (PIL quantizes between passes), so output may differ
    # from the host path by +/-1 greylevel where the cubic overshoots;
    # quality parity is pinned in tests/test_yuv.py.
    # ------------------------------------------------------------------

    _yuv_run = None

    def _build_yuv(self):
        from ..ops.resize import bicubic_upscale
        from ..utils.metrics import _YCBCR_O, _YCBCR_T

        stages, modes = self.stages, self.modes
        scale, interval = self.scale, self.interval
        kernel = self.kernel
        T = jnp.asarray(_YCBCR_T, jnp.float32)
        O = jnp.asarray(_YCBCR_O, jnp.float32)
        Ti = jnp.asarray(np.linalg.inv(_YCBCR_T), jnp.float32)
        copts = None
        if kernel:
            from ..utils.xla_opts import tpu_compiler_options

            copts = tpu_compiler_options()

        @functools.partial(jax.jit, compiler_options=copts)
        def _yuv_tabs(tabs, rgb):  # (B, H, W, 3) uint8
            B, H, W = rgb.shape[0], rgb.shape[1], rgb.shape[2]
            ycc = jnp.einsum("...c,oc->...o", rgb.astype(jnp.float32), T,
                             precision=jax.lax.Precision.HIGHEST) + O
            y = jnp.clip(jnp.round(ycc[..., 0]), 0, 255).astype(jnp.int32)
            if kernel:
                packed = self._tk.lut_cascade_packed(
                    tabs, y[:, None], stages=stages, modes=modes,
                    scale=scale, interval=interval)
                y_sr = self._tk.unpack_u32_device(
                    packed, (B, 1), H, W, scale)[:, 0]
            else:
                y_sr = lut_cascade_int(
                    tabs, y[:, None], stages=stages, modes=modes,
                    scale=scale, interval=interval, expanded=True)[:, 0]
            cbcr = jnp.clip(jnp.round(ycc[..., 1:]), 0, 255)
            cbcr_sr = bicubic_upscale(jnp.moveaxis(cbcr, -1, 1), scale)
            ycc_sr = jnp.stack(
                [y_sr.astype(jnp.float32), cbcr_sr[:, 0], cbcr_sr[:, 1]],
                axis=-1)
            rgb_sr = jnp.einsum("...c,oc->...o", ycc_sr - O, Ti,
                                precision=jax.lax.Precision.HIGHEST)
            return jnp.clip(jnp.round(rgb_sr), 0, 255).astype(jnp.uint8)

        self._yuv_run = functools.partial(_yuv_tabs, self.luts)

    def upscale_yuv_batch(self, imgs_rgb: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 RGB -> (B, H*s, W*s, 3) uint8, one dispatch.

        The device YUV pipeline: ~3x the output rate of `upscale_batch`
        on the same engine (the cascade sees one plane instead of three).
        """
        if self._yuv_run is None:
            self._build_yuv()
        h, w = imgs_rgb.shape[1:3]
        # the YUV program is always untiled (no banding inside the fused
        # jit), so enforce the HBM-safe cap even on a banded evaluator
        if h * w * imgs_rgb.shape[0] > self.max_batch_pixels:
            raise ValueError(
                f"YUV batch {imgs_rgb.shape[0]}x{h}x{w} exceeds the untiled "
                f"HBM-safe size ({self.max_batch_pixels} px); split the "
                "batch or raise max_batch_pixels explicitly"
            )
        return np.asarray(self._yuv_run(jnp.asarray(imgs_rgb)))

    def upscale_yuv(self, img_rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (H*s, W*s, 3) uint8 via the device YUV
        pipeline (see `upscale_yuv_batch`)."""
        return self.upscale_yuv_batch(img_rgb[None])[0]

    def _check_untiled_size(self, hb: int, wb: int, channels: int) -> None:
        """Refuse to run an untiled cascade past the HBM-safe pixel cap.

        Without a band, a single oversized image inside a bucketed batch
        would dispatch the untiled cascade and can exhaust HBM; raise
        loudly instead of OOMing mid-dataset.
        """
        if self.band:
            return  # banded slabs bound the temporaries
        if hb * wb * channels > self.max_batch_pixels:
            raise ValueError(
                f"image bucket {hb}x{wb} exceeds the untiled HBM-safe size "
                f"({self.max_batch_pixels} px); pass band>0 (--evalBand) to "
                "stream it, or raise max_batch_pixels explicitly"
            )


class NetEvaluator:
    """Deploys the trained MuLUT network directly (no LUT caching).

    TPU-first deployment mode: the cacheable units are tiny tap-MLPs, and
    the MXU evaluates them faster than any table can be gathered — LUTs
    exist to make CPUs fast, matmuls make TPUs fast.  Output quality equals
    the CNN validation PSNR (ref train.log iter-200000 numbers), i.e. it
    slightly EXCEEDS the quantized LUT path; use `LutEvaluator` when
    bit-parity with the reference LUT engine is required.
    """

    #: LR pixel count above which the band-tiled forward is used (the
    #: untiled cascade materializes ~25 KB of activations per LR pixel).
    TILE_THRESHOLD = 96 * 96
    BAND = 16

    def __init__(self, params: dict, *, stages: int, modes: str, scale: int,
                 fast: bool = False, quant: bool | str = False,
                 n_devices: int = 1):
        """fast=True runs the tap-MLPs in bfloat16 with single-pass MXU
        matmuls — ~0.01 dB below the f32 path, several times faster.

        n_devices > 1 shards `upscale_batch` / `upscale_yuv_batch` over a
        1-D device mesh via shard_map (the net forward is embarrassingly
        batch-parallel — no collectives; the Pallas kernels run
        per-shard).  The DataParallel surface of the reference, extended
        to net-mode deployment (ref: sr/1_train_model.py:141-142).

        quant (implies fast) additionally quantizes plain (mxu-arch)
        units to W8A8 with grid-calibrated static activation scales
        (ops/quant.py).  True selects the default integer fixed-point
        requant datapath; a string ('f32', 'f32w6', 'int') pins the
        inter-layer requant form explicitly (the measured A/B axis —
        all are SLOWER than bf16 on v5e, see PERF.md "W8A8 int8
        deployment"; the path ships as the measured record).
        Plain-arch only; raises ValueError on dense-concat params."""
        from ..models.srnet import srnets_predict, srnets_predict_tiled

        self.stages = stages
        self.modes = modes
        self.scale = scale
        fast = fast or quant
        self.fast = fast
        self.n_devices = max(1, min(n_devices, jax.device_count()))
        self.mesh = None
        if self.n_devices > 1:
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(self.n_devices)
        use_kernel = fast and jax.default_backend() == "tpu"
        if quant and not use_kernel:
            raise ValueError(
                "quant=True needs the TPU Pallas kernel path; for CPU "
                "testing drive srnets_predict_fast(quantized_stacks, ..., "
                "interpret=True) directly")
        params_f32 = params
        if fast:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), params
            )
            precision = jax.lax.Precision.DEFAULT
        else:
            precision = jax.lax.Precision.HIGHEST
        self.params = params

        if use_kernel:
            # the whole mode x rotation ensemble runs inside the Pallas
            # stage-ensemble kernel — activations never touch HBM, so no
            # band tiling is needed either
            from ..models.srnet import srnets_predict_fast, stack_srnets_for_fast

            # MULUT_PAIRED_KERNEL=1 selects the rotation-pair block-
            # diagonal kernel schedule (bit-identical outputs; see
            # unit_kernel.pair_stage_params)
            import os

            if quant:
                from ..ops.quant import quantize_srnets_for_fast

                requant = quant if isinstance(quant, str) else "int"
                stacked = quantize_srnets_for_fast(
                    params_f32, modes=modes, stages=stages, scale=scale,
                    requant=requant)
            else:
                stacked = stack_srnets_for_fast(
                    params, modes=modes, stages=stages, scale=scale,
                    paired=os.environ.get("MULUT_PAIRED_KERNEL", "0") == "1",
                )

            @jax.jit
            def _run(x):
                return srnets_predict_fast(
                    stacked, x, modes=modes, stages=stages, scale=scale
                ).astype(jnp.float32)

            _run_tiled = lambda x, axis=2: _run(x)  # noqa: E731

            if any("hw" in st for st in stacked) and not quant:
                # plain (mxu-arch) stacks: a dedicated luma runner for
                # the fused YUV pipeline with the clip(round(.), 0, 255)
                # folded into the kernel epilogue (final_u8 mix) and a
                # bf16 result — halves the interleave bytes; final
                # pixels identical (the u8 quantizer clips anyway)
                @jax.jit
                def _luma_clip(x):
                    from ..models import srnet as _sn

                    # feature layout + x4: u32-packed kernel epilogue
                    # (free-bitcast interleave); else bf16 clip epilogue
                    clip = ("pack" if _sn.PLAIN_LAYOUT == "feature"
                            and scale == 4 else True)
                    return srnets_predict_fast(
                        stacked, x, modes=modes, stages=stages,
                        scale=scale, final_clip=clip)

                self._luma_clip_run = _luma_clip
        else:
            @jax.jit
            def _run(x):
                if fast:
                    x = x.astype(jnp.bfloat16)
                out = srnets_predict(params, x, modes=modes, stages=stages,
                                     scale=scale, phase="valid",
                                     precision=precision)
                return out.astype(jnp.float32)

            @functools.partial(jax.jit, static_argnames=("axis",))
            def _run_tiled(x, axis=2):
                if fast:
                    x = x.astype(jnp.bfloat16)
                out = srnets_predict_tiled(params, x, modes=modes,
                                           stages=stages, scale=scale,
                                           phase="valid", band=self.BAND,
                                           precision=precision, axis=axis)
                return out.astype(jnp.float32)

        self._run = _run
        self._run_tiled = _run_tiled

    @classmethod
    def from_checkpoint(cls, path: str, *, stages: int = 2, modes: str = "sdy",
                        scale: int = 4, fast: bool = False,
                        quant: bool | str = False):
        if path.endswith(".npz"):
            from ..models.torch_import import load_params_npz

            params = load_params_npz(path)
        else:
            from ..models.torch_import import srnets_params_from_torch

            params = srnets_params_from_torch(path, modes=modes, stages=stages)
        return cls(params, stages=stages, modes=modes, scale=scale, fast=fast,
                   quant=quant)

    def upscale(self, img_lr: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 LR -> (H*scale, W*scale, 3) uint8 SR."""
        x = jnp.asarray(
            img_lr.astype(np.float32).transpose(2, 0, 1)[None] / 255.0
        )
        h, w = img_lr.shape[:2]
        # Band along whichever spatial axis is long enough (a short-but-wide
        # image must still tile, or the untiled cascade can exhaust HBM).
        min_dim = self.BAND + 8
        if h * w > self.TILE_THRESHOLD and max(h, w) >= min_dim:
            axis = 2 if h >= min_dim else 3
            out = np.asarray(self._run_tiled(x, axis=axis))
        else:
            out = np.asarray(self._run(x))
        out = out[0].transpose(1, 2, 0)
        return np.round(np.clip(out, 0, 255)).astype(np.uint8)

    def _shard_batched(self, fn):
        """shard_map a batched forward over the 1-D mesh (leading axis).

        The forward has no cross-batch communication, so each device runs
        its local slice (Pallas kernels included); jit assembles the
        sharded output.
        """
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map

            kw = {"check_vma": False}  # jax.shard_map's renamed check flag
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

            kw = {"check_rep": False}

        return jax.jit(shard_map(
            fn, mesh=self.mesh, in_specs=P("data"), out_specs=P("data"),
            **kw,
        ))

    def _pad_to_devices(self, arr: np.ndarray):
        """Pad the batch to a device multiple by repeating the last item
        (replicas are cropped off — bit-identical)."""
        pad = -arr.shape[0] % self.n_devices
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, 0)])
        return arr

    _run_sharded = None

    def upscale_batch(self, imgs_lr: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, H*scale, W*scale, 3) uint8.

        Batched same-shape throughput path (channels and batch both ride
        the leading axes of the tap matrix; one dispatch) — sharded over
        the mesh when n_devices > 1."""
        n = imgs_lr.shape[0]
        if self.mesh is not None:
            imgs_lr = self._pad_to_devices(imgs_lr)
        x = jnp.asarray(
            imgs_lr.astype(np.float32).transpose(0, 3, 1, 2) / 255.0
        )
        h, w = imgs_lr.shape[1:3]
        min_dim = self.BAND + 8
        if h * w > self.TILE_THRESHOLD and max(h, w) >= min_dim:
            out = np.asarray(self._run_tiled(x, axis=2 if h >= min_dim
                                             else 3))
        elif self.mesh is not None:
            if self._run_sharded is None:
                self._run_sharded = self._shard_batched(self._run)
            out = np.asarray(self._run_sharded(x))
        else:
            out = np.asarray(self._run(x))
        out = out[:n].transpose(0, 2, 3, 1)
        return np.round(np.clip(out, 0, 255)).astype(np.uint8)

    _yuv_run = None

    def _build_yuv(self):
        # Fused device YUV pipeline over the MXU path — same structure as
        # LutEvaluator._build_yuv (ref: sr/Test.py:317-398): luma through
        # the tap-MLP cascade, chroma as two dense bicubic matmuls, color
        # transforms in-graph.  The luma plane is 1/3 of an RGB pass, so
        # this is the framework's highest-throughput deployment form.
        from ..ops.resize import bicubic_upscale
        from ..utils.metrics import _YCBCR_O, _YCBCR_T

        T = jnp.asarray(_YCBCR_T, jnp.float32)
        O = jnp.asarray(_YCBCR_O, jnp.float32)
        Ti = np.linalg.inv(_YCBCR_T)  # host constants for the plane FMAs
        run, run_tiled = self._run, self._run_tiled
        luma_run = run
        if getattr(self, "_luma_clip_run", None) is not None:
            luma_run = self._luma_clip_run
        scale, threshold = self.scale, self.TILE_THRESHOLD
        min_dim = self.BAND + 8

        @jax.jit
        def _yuv(rgb):  # (B, H, W, 3) uint8
            h, w = rgb.shape[1], rgb.shape[2]
            ycc = jnp.einsum("...c,oc->...o", rgb.astype(jnp.float32), T,
                             precision=jax.lax.Precision.HIGHEST) + O
            y = jnp.clip(jnp.round(ycc[..., 0]), 0, 255)
            x = y[:, None] / 255.0
            if luma_run is not run:
                # the dedicated luma runner (plain-arch Pallas path)
                # clips+rounds in the kernel epilogue (final_u8 mix) and
                # emits bf16 — half the interleave bytes; the kernel
                # path needs no band tiling at any size, so it serves
                # every shape (the threshold branch below routed the
                # bench shape through the f32 'final' mix and cost
                # ~2 ms/batch of f32 copies + an XLA clamp, r4 trace)
                y_u8 = luma_run(x)[:, 0]
                # barrier: without it XLA hoists the u8->f32 convert of
                # the luma plane ABOVE the interleave transposes, paying
                # them in f32 (copy.29 + copy.33 ~3 ms at 8x1080p, r5
                # trace) — exactly the copies the u32-packed kernel
                # epilogue exists to avoid.  The barrier pins the
                # transpose in the u8 domain; the convert then fuses
                # into the color FMAs.
                y_sr = jax.lax.optimization_barrier(y_u8).astype(
                    jnp.float32)
            elif h * w > threshold and max(h, w) >= min_dim:
                # static-shape band selection, mirroring `upscale`
                y_sr = run_tiled(x, axis=2 if h >= min_dim else 3)
                y_sr = jnp.clip(jnp.round(y_sr[:, 0]), 0, 255)
            else:
                y_sr = run(x)[:, 0]
                y_sr = jnp.clip(jnp.round(y_sr), 0, 255)
            cbcr = jnp.clip(jnp.round(ycc[..., 1:]), 0, 255)
            cbcr_sr = bicubic_upscale(jnp.moveaxis(cbcr, -1, 1), scale)
            cb, cr = cbcr_sr[:, 0], cbcr_sr[:, 1]
            # YCbCr -> RGB as per-output-channel plane FMAs: stacking the
            # three (B, Hs, Ws) planes into an f32 (..., 3) tensor before
            # an einsum costs a 1.5 ms relayout copy of the luma plane at
            # 8x1080p (r4 trace); the FMA form fuses per channel with no
            # stacked f32 intermediate.  Algebraically identical to the
            # einsum (the offset is folded into one constant); last-ulp
            # rounding may differ, which can flip a round() tie by ±1
            # greylevel — this path is PSNR-scored, not golden-pinned.
            chans = []
            for o in range(3):
                plane = (y_sr * np.float32(Ti[o, 0])
                         + cb * np.float32(Ti[o, 1])
                         + cr * np.float32(Ti[o, 2])
                         + np.float32(-(Ti[o] @ _YCBCR_O)))
                chans.append(
                    jnp.clip(jnp.round(plane), 0, 255).astype(jnp.uint8))
            return jnp.stack(chans, axis=-1)

        self._yuv_run = _yuv

    _yuv_sharded = None

    def upscale_yuv_batch(self, imgs_rgb: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 RGB -> (B, H*s, W*s, 3) uint8 — the device
        YUV pipeline over the MXU path, one dispatch (batch-sharded over
        the mesh when n_devices > 1)."""
        if self._yuv_run is None:
            self._build_yuv()
        if self.mesh is None:
            return np.asarray(self._yuv_run(jnp.asarray(imgs_rgb)))
        n = imgs_rgb.shape[0]
        if self._yuv_sharded is None:
            self._yuv_sharded = self._shard_batched(self._yuv_run)
        padded = self._pad_to_devices(imgs_rgb)
        return np.asarray(self._yuv_sharded(jnp.asarray(padded)))[:n]

    def upscale_yuv(self, img_rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (H*s, W*s, 3) uint8 (see
        `upscale_yuv_batch`)."""
        return self.upscale_yuv_batch(img_rgb[None])[0]


def eval_dataset(evaluator: LutEvaluator, test_dir: str, dataset: str,
                 result_path: str | None = None, *, lut_name: str = "LUT_ft",
                 interval: int = 4):
    """Evaluate one benchmark dataset; save result PNGs; return per-image
    (psnr, ssim) (ref: sr/4_test_lut.py:240-316, fixed LR path per
    sr/5_test_lut.py:527)."""
    scale = evaluator.scale
    hr_dir = os.path.join(test_dir, dataset, "HR")
    lr_dir = os.path.join(test_dir, dataset, f"LR_bicubic/X{scale}")
    files = sorted(os.listdir(hr_dir))

    imgs_lr = [load_image(os.path.join(lr_dir, f)) for f in files]
    gts = [modcrop(load_image(os.path.join(hr_dir, f)), scale) for f in files]
    if getattr(evaluator, "bucket", 0):
        # Whole-dataset batched dispatch: one compiled program per bucket
        # shape instead of the reference's per-image Pool(24) fan-out.
        outs = evaluator.upscale_many(imgs_lr)
    else:
        outs = [evaluator.upscale(img) for img in imgs_lr]

    results = []
    for f, img_gt, img_out in zip(files, gts, outs):
        if result_path is not None:
            save_image(
                os.path.join(
                    result_path, f"{f[:-4]}_{lut_name}_{8 - interval}bit.png"
                ),
                img_out,
            )
        results.append(psnr_ssim_y(img_gt, img_out, scale))
    return results


def run_test(opt, datasets=("Set5",)) -> dict:
    """Step-4 CLI behavior: load LUTs, evaluate datasets, print summary."""
    evaluator = LutEvaluator.from_folder(
        opt.expDir, stages=opt.stages, modes=opt.modes, scale=opt.scale,
        interval=opt.interval, lut_name=opt.lutName,
        bucket=getattr(opt, "evalBucket", 0),
        band=getattr(opt, "evalBand", 0),
        n_devices=getattr(opt, "gpuNum", 1),
    )
    exp_name = opt.expDir.rstrip("/").split("/")[-1]
    summary = {}
    for dataset in datasets:
        result_path = os.path.join(
            opt.resultRoot, exp_name, dataset, f"X{opt.scale}"
        )
        os.makedirs(result_path, exist_ok=True)
        results = eval_dataset(
            evaluator, opt.testDir, dataset, result_path,
            lut_name=opt.lutName, interval=opt.interval
        )
        arr = np.asarray(results)
        print(
            "Dataset {} | AVG LUT PSNR: {:.2f} SSIM: {:.4f}".format(
                dataset, arr[:, 0].mean(), arr[:, 1].mean()
            )
        )
        summary[dataset] = (float(arr[:, 0].mean()), float(arr[:, 1].mean()))
    return summary


def process_single_image(image_path: str, lut_folder: str, output_path: str | None
                         = None, *, stages: int = 2, modes: str = "sdy",
                         scale: int = 4, interval: int = 4,
                         lut_name: str = "LUT_ft", gt_path: str | None = None):
    """Single-image API (ref: sr/5_test_lut.py:241-414).

    Returns (sr_image, metrics_or_None); metrics = (psnr, ssim) when gt given.
    """
    evaluator = LutEvaluator.from_folder(
        lut_folder, stages=stages, modes=modes, scale=scale,
        interval=interval, lut_name=lut_name
    )
    img_lr = load_image(image_path)
    img_out = evaluator.upscale(img_lr)
    if output_path:
        save_image(output_path, img_out)
    metrics = None
    if gt_path:
        img_gt = modcrop(load_image(gt_path), scale)
        metrics = psnr_ssim_y(img_gt, img_out, scale)
    return img_out, metrics
