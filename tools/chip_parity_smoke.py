"""Compiled-TPU numeric parity smoke (VERDICT round-1 item 6).

The CPU suite runs the Pallas *interpreter*; a Mosaic lowering bug
(layout, DMA, semaphore) would pass it and ship. This script runs the
dense, lite (fine + coarse), paged, and backward kernels COMPILED on the
real chip against the fp32 oracle on small shapes and asserts numerics.

Run each round before BENCH:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/chip_parity_smoke.py

Exits nonzero on any mismatch. Budget ~3-6 min (first compiles).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, want, atol):
    err = float(
        jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
    )
    status = "OK " if err <= atol else "FAIL"
    print(f"{status} {name}: max err {err:.2e} (atol {atol:.0e})")
    return err <= atol


def main():
    assert jax.default_backend() == "tpu", (
        f"need the real chip, got {jax.default_backend()}"
    )
    from liteattention_tpu.ops.attention_ref import (
        attention_ref,
        skip_votes_ref_fine,
        skip_votes_ref_gather,
    )
    from liteattention_tpu.ops.flash_fwd import (
        flash_attention,
        flash_attention_masked,
    )
    from liteattention_tpu.ops.lite_flash_fwd import lite_flash_attention
    from liteattention_tpu.ops.mask import (
        compact_mask_fine,
        compact_mask_gather,
    )
    from liteattention_tpu.ops.paged_attention import paged_attention
    from liteattention_tpu.ops.tile_sizes import BlockSizes

    t0 = time.time()
    ok = True
    b, h, s, d = 1, 2, 1024, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    bs = BlockSizes(512, 512)

    # Dense (f32 + bf16) vs oracle.
    ref, ref_lse = attention_ref(q, k, v)
    out, lse = flash_attention(
        q, k, v, block_sizes=bs, return_lse=True, interpret=False
    )
    ok &= check("dense f32 out", out, ref, 3e-5)
    ok &= check("dense f32 lse", lse, ref_lse, 3e-5)
    out16 = flash_attention(
        *(x.astype(jnp.bfloat16) for x in (q, k, v)),
        block_sizes=bs, interpret=False,
    )
    ok &= check("dense bf16 out", out16, ref, 2e-2)

    # Causal + window + softcap channel.
    refc, _ = attention_ref(q, k, v, causal=True)
    outc = flash_attention(
        q, k, v, causal=True, block_sizes=bs, interpret=False
    )
    # Causal rows with few valid keys amplify accumulation-order noise;
    # 1e-4-level f32 deviation is expected (CPU tests use 2e-4 too).
    ok &= check("dense causal", outc, refc, 3e-4)

    # Lite fine path: output vs fine-masked oracle, votes vs vote oracle.
    rng = np.random.RandomState(1)
    qtf = s // 128
    mask = rng.rand(b, h, qtf, qtf) < 0.6
    mask[..., 0] = True
    maskj = jnp.asarray(mask)
    kv_idx, count, bits = compact_mask_fine(maskj, 4, 4)
    outl, lsel, votes = lite_flash_attention(
        q, k, v, kv_idx, count, jnp.float32(-3.0), kv_bits=bits,
        block_sizes=bs, interpret=False,
    )
    refl, refl_lse = attention_ref(
        q, k, v, tile_mask=maskj, block_q=128, block_k=128
    )
    ok &= check("lite fine out", outl, refl, 3e-5)
    ok &= check("lite fine lse", lsel, refl_lse, 3e-5)
    ref_votes = skip_votes_ref_fine(q, k, maskj, -3.0, 512, 512)
    vote_mism = int((np.asarray(votes)[mask] != ref_votes[mask]).sum())
    print(("OK " if vote_mism == 0 else "FAIL")
          + f" lite fine votes: {vote_mism} mismatches at live tiles")
    ok &= vote_mism == 0

    # Lite GATHER path (the engine default): output + votes.
    fidx, count, qbits = compact_mask_gather(maskj, 4)
    outg, lseg, votesg = lite_flash_attention(
        q, k, v, fidx, count, jnp.float32(-3.0), kv_bits=qbits,
        block_sizes=bs, fine_schedule=True, interpret=False,
    )
    ok &= check("lite gather out", outg, refl, 3e-5)
    ok &= check("lite gather lse", lseg, refl_lse, 3e-5)
    ref_votes_g = skip_votes_ref_gather(q, k, maskj, -3.0, 512, 4)
    gm = int((np.asarray(votesg)[mask] != ref_votes_g[mask]).sum())
    print(("OK " if gm == 0 else "FAIL")
          + f" lite gather votes: {gm} mismatches at live tiles")
    ok &= gm == 0

    # Pallas schedule packer vs the XLA pipeline, BIT-identical on the
    # compiled chip. ktf=384 > 256 exercises index values that default
    # matmul precision would round through bf16 (interpret mode cannot
    # catch that); mixed densities exercise anchor tails + run flags.
    from liteattention_tpu.ops.lite_flash_fwd import (
        build_gather_schedule,
    )
    from liteattention_tpu.ops.schedule_pack import pack_schedule

    ktf_p = 384
    rng_p = np.random.RandomState(7)
    mask_p = rng_p.rand(1, 2, ktf_p, ktf_p) < np.linspace(
        0.02, 0.9, ktf_p
    ).reshape(-1, 1)
    mask_pj = jnp.asarray(mask_p)
    fx, ct, qb = compact_mask_gather(mask_pj, 4)
    want_p = build_gather_schedule(
        fx, ct, qb, gsize=8, qsubs=4, seqlen_k=ktf_p * 128 - 37
    )
    got_p = pack_schedule(
        mask_pj, qsubs=4, gsize=8, seqlen_k=ktf_p * 128 - 37,
        interpret=False,
    )
    pm = int((np.asarray(got_p) != np.asarray(want_p)).sum())
    print(("OK " if pm == 0 else "FAIL")
          + f" schedule pack wire format: {pm} word mismatches")
    ok &= pm == 0

    # Paged decode vs oracle.
    hk, pages, psz = 2, 16, 128
    kp = jax.random.normal(ks[1], (hk, pages, psz, d), jnp.float32)
    vp = jax.random.normal(ks[2], (hk, pages, psz, d), jnp.float32)
    qd = jax.random.normal(ks[0], (2, hk, d), jnp.float32)
    lens = jnp.asarray([700, 300], jnp.int32)
    tbl = jnp.asarray(
        np.random.RandomState(2).permutation(pages)[:16].reshape(2, 8),
        jnp.int32,
    )
    outp = paged_attention(qd, kp, vp, lens, tbl, interpret=False)
    for i in range(2):
        n = int(lens[i])
        kc = np.asarray(kp)[:, np.asarray(tbl)[i]].reshape(hk, -1, d)[:, :n]
        vc = np.asarray(vp)[:, np.asarray(tbl)[i]].reshape(hk, -1, d)[:, :n]
        refp, _ = attention_ref(
            jnp.asarray(qd)[i][:, None][None],
            jnp.asarray(kc)[None],
            jnp.asarray(vc)[None],
        )
        ok &= check(
            f"paged decode b{i}", outp[i][:, None][None], refp, 3e-5
        )

    # Folded paged decode (native pools), multi-page steps, int8 pool.
    from liteattention_tpu.ops.kv_quant import quantize_kv_pages
    from liteattention_tpu.ops.paged_attention import (
        paged_attention_folded,
    )

    hq2, hk2, d2, psz2, pps2 = 8, 4, 128, 64, 5
    npg2 = 2 * pps2 + 2
    kp2 = jax.random.normal(
        ks[1], (npg2, psz2, hk2, d2), jnp.float32
    )
    vp2 = jax.random.normal(ks[2], (npg2, psz2, hk2, d2), jnp.float32)
    q2 = jax.random.normal(ks[0], (2, 1, hq2, d2), jnp.float32)
    tbl2 = jnp.asarray(
        np.random.RandomState(3).permutation(npg2)[: 2 * pps2]
        .reshape(2, pps2),
        jnp.int32,
    )
    lens2 = jnp.asarray([psz2 * pps2 - 9, psz2 + 5], jnp.int32)
    f1 = paged_attention_folded(
        q2, kp2, vp2, lens2, tbl2, causal=True, interpret=False,
        pages_per_step=1,
    )
    f3 = paged_attention_folded(
        q2, kp2, vp2, lens2, tbl2, causal=True, interpret=False,
        pages_per_step=3,
    )
    ok &= check("folded paged pages_per_step=3", f3, f1, 3e-5)
    pool = quantize_kv_pages(kp2.astype(jnp.bfloat16),
                             vp2.astype(jnp.bfloat16))
    fi8 = paged_attention_folded(
        q2.astype(jnp.bfloat16), pool.k, pool.v, lens2, tbl2,
        causal=True, interpret=False, k_scale=pool.k_scale,
        v_scale=pool.v_scale,
    )
    ok &= check("folded paged int8 (auto multi-page)",
                fi8.astype(jnp.float32), f1, 0.06)

    # Absorbed-MLA decode (d=576 latent, dv=512, paged + contiguous)
    # vs oracle -- exercises the non-128-multiple lane dim on Mosaic.
    from liteattention_tpu.ops.mla import mla_decode

    dm, dvm, hqm, sm = 576, 512, 16, 256
    kvm = jax.random.normal(ks[1], (2, sm, dm), jnp.float32)
    qm = jax.random.normal(ks[0], (2, 1, hqm, dm), jnp.float32)
    lensm = jnp.asarray([sm, sm - 100], jnp.int32)
    om = mla_decode(qm, kvm, lensm, dvm, causal=True, interpret=False)
    sc = 1.0 / dm**0.5
    sm_scores = (
        jnp.einsum("bqhd,bkd->bhqk", qm.astype(jnp.float32), kvm,
                   precision=jax.lax.Precision.HIGHEST) * sc
    )
    colm = jnp.arange(sm)[None, None, None, :]
    sm_scores = jnp.where(
        colm < lensm[:, None, None, None], sm_scores, -1e30
    )
    pm = jax.nn.softmax(sm_scores, axis=-1)
    refm = jnp.einsum("bhqk,bkd->bqhd", pm, kvm[..., :dvm],
                      precision=jax.lax.Precision.HIGHEST)
    ok &= check("mla decode contiguous", om, refm, 3e-5)
    psm = 64
    ppm = sm // psm
    om_p = mla_decode(
        qm, kvm.reshape(2 * ppm, psm, dm), lensm, dvm,
        page_table=jnp.arange(2 * ppm, dtype=jnp.int32).reshape(2, ppm),
        causal=True, interpret=False,
    )
    ok &= check("mla decode paged", om_p, refm, 3e-5)

    # Dense MLA fwd (unequal dv + qv term) vs oracle.
    qq = q[:, :, :256, :64]
    kk = k[:, :, :256, :64]
    vv = v[:, :, :256, :]
    qvt = jax.random.normal(ks[2], qq.shape[:3] + (d,), jnp.float32)
    scm = (64 + d) ** -0.5
    outm = flash_attention(
        qq, kk, vv, scale=scm, qv=qvt, block_sizes=BlockSizes(128, 128),
        interpret=False,
    )
    sref = (
        jnp.einsum("bhqd,bhkd->bhqk", qq, kk,
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.einsum("bhqd,bhkd->bhqk", qvt, vv,
                     precision=jax.lax.Precision.HIGHEST)
    ) * scm
    refqv = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sref, -1), vv,
                       precision=jax.lax.Precision.HIGHEST)
    ok &= check("dense qv (MLA) fwd", outm, refqv, 3e-5)

    # Backward vs autodiff-of-oracle.
    def loss_kernel(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, block_sizes=bs,
                            interpret=False) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(attention_ref(q, k, v, causal=True)[0] ** 2)

    s2 = 512
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(
        q[:, :, :s2], k[:, :, :s2], v[:, :, :s2]
    )
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q[:, :, :s2], k[:, :, :s2], v[:, :, :s2]
    )
    for name, a, bb in zip(("dq", "dk", "dv"), gk, gr):
        ok &= check(f"bwd {name}", a, bb, 5e-4)

    print(f"total {time.time()-t0:.0f}s")
    if not ok:
        sys.exit(1)
    print("ALL PARITY CHECKS PASSED ON CHIP")


if __name__ == "__main__":
    main()
