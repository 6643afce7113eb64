"""Experimental SLOT-PAIRED variant of the folded fused+quant selfterm
paged-attention kernel: grid (B/P,) with P slots per program instead of
(B,). Measured per-program fixed cost is ~0.5 us and per-block fixed cost
~0.6 us (experiments/program_cost_probe.py: B=128/640tok/1blk = 13.62 ms,
B=64/1280tok/2blk = 12.52, B=64/1280tok/1blk = 11.21, B=32/2560tok/4blk =
12.07 per 32-layer step-equiv against a ~6.6 ms DMA-byte bound), so
folding P slots into one program — P x the DMA per block, ONE
[P, Hkv, SG, bk] batched dot pair and ONE set of VPU softmax ops —
amortizes BOTH fixed costs by P. Predicted kernel time at bench shapes:
P=2 ~ 11.4 ms, P=4 ~ 10.3 ms vs 13.6 production.

Checks numerics vs the production kernel (mixed lengths incl. a
pair-member with far fewer blocks than its partner), then times at bench
shapes (B=128, 640-token fused int8 pools, ppcb=6)."""
import os, sys, time, json, functools
os.environ.setdefault("JAX_PLATFORMS", "")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vis_zephyr_tpu.ops.paged_attention import (
    NEG_INF, KV_QUANT_MAX, paged_attention_fa)
from bench import _sync


def _paired_kernel(G, S, bk, ppcb, page_size, pages_per_seq, scale,
                   window, batch_size, num_kv_heads, P):
    """fused + quant + has_new only (the serving hot configuration).

    One program owns slots [g*P, (g+1)*P). The block walk runs over the
    group's max block range; members whose range excludes block i skip
    their DMA (scalar guard) and are killed in compute by the slot/length
    mask (stale scratch is finite: zero-filled at init, only ever
    overwritten by fetched pool bytes)."""
    SG = S * G
    Hkv = num_kv_heads

    def member_dma(k_hbm, ks_hbm, kb, ksb, ksem, pt_ref, lengths_ref,
                   b, i, slot, p, wait):
        """DMA block i of absolute slot b into pair lane p of buffer slot."""
        base = b * pages_per_seq + i * ppcb
        npg = jnp.clip(
            lax.div(lengths_ref[b] + (page_size - 1), page_size) - i * ppcb,
            1, ppcb)
        pids = [pt_ref[base + jnp.minimum(j, pages_per_seq - 1 - i * ppcb)]
                for j in range(ppcb)]

        def go(copies):
            for c in copies:
                c.wait() if wait else c.start()

        def scatter(T):
            copies = []
            for j in range(T):
                copies.append(pltpu.make_async_copy(
                    k_hbm.at[:, pids[j]], kb.at[slot, p, :, j],
                    ksem.at[slot]))
                copies.append(pltpu.make_async_copy(
                    ks_hbm.at[:, pids[j]], ksb.at[slot, p, :, j],
                    ksem.at[slot]))
            go(copies)

        def run(T):
            go([pltpu.make_async_copy(
                    k_hbm.at[:, pl.ds(pids[0], T)],
                    kb.at[slot, p, :, pl.ds(0, T)], ksem.at[slot]),
                pltpu.make_async_copy(
                    ks_hbm.at[:, pl.ds(pids[0], T)],
                    ksb.at[slot, p, :, pl.ds(0, T)], ksem.at[slot])])

        if ppcb == 1:
            scatter(1)
            return
        pool_pages = k_hbm.shape[1]
        for T in range(1, ppcb + 1):
            is_T = npg == T
            if T == 1:
                @pl.when(is_T)
                def _one():
                    scatter(1)
            elif T > pool_pages:
                @pl.when(is_T)
                def _scatter_only(T=T):
                    scatter(T)
            else:
                run_ok = pids[1] == pids[0] + 1
                for j in range(2, T):
                    run_ok &= pids[j] == pids[0] + j

                @pl.when(is_T & run_ok)
                def _run(T=T):
                    run(T)

                @pl.when(is_T & jnp.logical_not(run_ok))
                def _scatter(T=T):
                    scatter(T)

    def kernel(lengths_ref, pt_ref, qoffs_ref, buf_ref, init_ref, q_ref,
               kn_ref, vn_ref, k_hbm, ks_hbm, o_ref,
               kb, ksb, ksem, m_s, l_s, acc_s):
        g = pl.program_id(0)
        num_groups = batch_size // P

        def lo_blk(b):
            if window is None:
                return jnp.int32(0)
            return jnp.maximum(qoffs_ref[b] - (window - 1), 0) // bk

        def hi_blk(b):
            return lax.div(lengths_ref[b] + (bk - 1), bk)

        def grp_lo(gg):
            lo = lo_blk(gg * P)
            for p in range(1, P):
                lo = jnp.minimum(lo, lo_blk(gg * P + p))
            return lo

        def grp_hi(gg):
            hi = hi_blk(gg * P)
            for p in range(1, P):
                hi = jnp.maximum(hi, hi_blk(gg * P + p))
            return hi

        def empty(gg):
            gc = jnp.minimum(gg, num_groups - 1)
            return grp_hi(gc) <= grp_lo(gc)

        def next_indices(gg, i):
            def advance_g():
                next_g = gg + 1

                def scan():
                    found = lax.fori_loop(
                        next_g + 1, num_groups,
                        lambda b2, best: jnp.where(
                            (best < 0) & ~empty(b2), b2, best),
                        jnp.int32(-1))
                    return jnp.where(found < 0, num_groups, found)

                ng = lax.cond((next_g < num_groups) & empty(next_g), scan,
                              lambda: next_g)
                return ng, grp_lo(jnp.minimum(ng, num_groups - 1))

            return lax.cond(i < grp_hi(gg), lambda: (gg, i), advance_g)

        def group_dma(gg, i, slot, wait):
            """All members' DMAs for block i of group gg: a member only
            fetches when i is inside ITS block range (scalar guard; the
            start and wait predicates are identical, so they pair)."""
            for p in range(P):
                b = gg * P + p
                inside = (i >= lo_blk(b)) & (i < hi_blk(b))

                @pl.when(inside)
                def _go(b=b, p=p):
                    member_dma(k_hbm, ks_hbm, kb, ksb, ksem, pt_ref,
                               lengths_ref, b, i, slot, p, wait)

        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

        lo = grp_lo(g)
        hi = grp_hi(g)
        # Per-member scalar planes built by select-on-iota: Mosaic cannot
        # shape-cast a 1-D scalar vector up to 3-D, but scalar broadcasts
        # into vector ops are free.
        pidx = lax.broadcasted_iota(jnp.int32, (P, SG, bk), 0)
        lengthp = jnp.full((P, SG, bk), lengths_ref[g * P], jnp.int32)
        qoffp = jnp.full((P, SG, bk), qoffs_ref[g * P], jnp.int32)
        for p in range(1, P):
            lengthp = jnp.where(pidx == p, lengths_ref[g * P + p], lengthp)
            qoffp = jnp.where(pidx == p, qoffs_ref[g * P + p], qoffp)

        def body(i, _):
            buf = buf_ref[0]

            @pl.when(init_ref[0] == 1)
            def _first():
                init_ref[0] = 0
                kb[...] = jnp.zeros(kb.shape, kb.dtype)
                group_dma(g, i, buf, wait=False)

            ng, ni = next_indices(g, i + 1)

            @pl.when(ng < num_groups)
            def _prefetch():
                nbuf = 1 - buf
                group_dma(ng, ni, nbuf, wait=False)
                buf_ref[0] = nbuf

            group_dma(g, i, buf, wait=True)

            # Mask geometry: per pair member, shared across kv heads.
            slot = i * bk + lax.broadcasted_iota(jnp.int32, (P, SG, bk), 2)
            qpos = (qoffp
                    + lax.broadcasted_iota(jnp.int32, (P, SG, bk), 1) // G)
            mask = (slot <= qpos) & (slot < lengthp)
            if window is not None:
                mask &= slot > qpos - window
            mask4 = mask[:, None]                       # [P, 1, SG, bk]

            # Mosaic supports one matmul batch dim: fold P into the head
            # dim (leading-dim reshapes are layout no-ops — the tiled
            # trailing dims are untouched).
            kv = kb[buf]                                # [P, Hkv, ppcb, 2ps, D]
            q = q_ref[0].reshape(P * Hkv, SG, -1)
            k = kv[:, :, :, :page_size].reshape(P * Hkv, bk, -1)
            v = (kv[:, :, :, page_size:].reshape(P * Hkv, bk, -1)
                 .astype(q.dtype))
            s = lax.dot_general(
                q, k.astype(q.dtype), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32
            ).reshape(P, Hkv, SG, bk) * scale
            ksc = ksb[buf][:, :, :, 0, :page_size].reshape(P, Hkv, 1, bk)
            s = s * (ksc * (1.0 / KV_QUANT_MAX))
            s = jnp.where(mask4, s, NEG_INF)

            m_prev, l_prev = m_s[...], l_s[...]
            m_curr = jnp.max(s, axis=3, keepdims=True)
            m_next = jnp.maximum(m_prev,
                                 jnp.broadcast_to(m_curr, m_prev.shape))
            alpha = jnp.exp(m_prev - m_next)
            pexp = jnp.where(mask4, jnp.exp(s - m_next[:, :, :, :1]), 0.0)
            l_s[...] = alpha * l_prev + jnp.sum(pexp, axis=3, keepdims=True)
            m_s[...] = m_next
            acc_s[...] *= alpha[:, :, :, :1]
            vsc = ksb[buf][:, :, :, 0, page_size:].reshape(P, Hkv, 1, bk)
            pexp = jnp.where(mask4, pexp * (vsc * (1.0 / KV_QUANT_MAX)), 0.0)
            acc_s[...] += lax.dot_general(
                pexp.reshape(P * Hkv, SG, bk).astype(v.dtype), v,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).reshape(acc_s.shape)
            return ()

        lax.fori_loop(lo, hi, body, ())

        m_prev, l_prev, acc = m_s[...], l_s[...], acc_s[...]
        q = q_ref[0].astype(jnp.float32).reshape(P * Hkv, SG, -1)
        kn = kn_ref[0].reshape(P * Hkv, 1, -1).astype(jnp.float32)
        vn = vn_ref[0][:, :, None].astype(jnp.float32)   # [P, Hkv, 1, D]
        s_self = lax.dot_general(
            q, kn, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32
        ).reshape(P, Hkv, SG, 1) * scale
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(s_self, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p_self = jnp.exp(s_self - m_next[:, :, :, :1])
        l_prev = alpha * l_prev + p_self
        acc = acc * alpha[:, :, :, :1] + p_self * vn
        l = l_prev[:, :, :, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc * l_inv).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("pages_per_block", "window",
                                             "pair", "interpret"))
def fa_paired(q, k_pages, page_table, lengths, q_offs, k_new, v_new,
              k_scales, pages_per_block=6, window=None, pair=2,
              interpret=False):
    B, S, Hq, D = q.shape
    Hkv, _, two_ps, _ = k_pages.shape
    page_size = two_ps // 2
    pages_per_seq = page_table.shape[1]
    G = Hq // Hkv
    SG = S * G
    scale = D ** -0.5
    P = pair
    assert B % P == 0
    ppcb = min(pages_per_block, pages_per_seq)
    bk = ppcb * page_size

    qg = (q.reshape(B, S, Hkv, G, D).transpose(0, 2, 1, 3, 4)
          .reshape(B // P, P, Hkv, SG, D))
    kng = k_new.astype(q.dtype).reshape(B // P, P, Hkv, D)
    vng = v_new.astype(q.dtype).reshape(B // P, P, Hkv, D)
    kernel = _paired_kernel(G, S, bk, ppcb, page_size, pages_per_seq,
                            scale, window, B, Hkv, P)
    q_spec = pl.BlockSpec((1, P, Hkv, SG, D), lambda g, *_: (g, 0, 0, 0, 0))
    new_spec = pl.BlockSpec((1, P, Hkv, D), lambda g, *_: (g, 0, 0, 0))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B // P, P, Hkv, SG, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B // P,),
            in_specs=[q_spec, new_spec, new_spec,
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=q_spec,
            scratch_shapes=[
                pltpu.VMEM((2, P, Hkv, ppcb, 2 * page_size, D),
                           k_pages.dtype),
                pltpu.VMEM((2, P, Hkv, ppcb, 1, 2 * page_size), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((P, Hkv, SG, 128), jnp.float32),
                pltpu.VMEM((P, Hkv, SG, 128), jnp.float32),
                pltpu.VMEM((P, Hkv, SG, D), jnp.float32),
            ]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lengths, page_table.reshape(-1), q_offs,
      jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
      qg, kng, vng, k_pages, k_scales)
    return (out.reshape(B, Hkv, S, G, D).transpose(0, 2, 1, 3, 4)
            .reshape(B, S, Hq, D))


if __name__ == "__main__":
    out = {}
    print("device:", jax.devices()[0], flush=True)

    # ---- correctness vs the production kernel (small, mixed lengths) -----
    Hq, Hkv, D, ps = 8, 2, 128, 128
    B, pps = 8, 4
    rng = np.random.default_rng(0)
    num_pages = 1 + B * pps
    kpf = rng.standard_normal((Hkv, num_pages, 2 * ps, D)).astype(np.float32)
    kq = np.clip(np.rint(kpf * 20), -127, 127).astype(np.int8)
    ksc = (np.abs(rng.standard_normal((Hkv, num_pages, 1, 2 * ps)))
           .astype(np.float32) + 0.5)
    table = np.zeros((B, pps), np.int32)
    for b in range(B):
        table[b] = 1 + b * pps + np.arange(pps)
    # Pairs with very different block counts (3 vs 505, 130 vs 1, ...).
    lengths = np.array([3, 505, 130, 1, 257, 257, 512 - 7, 64], np.int32)
    q = rng.standard_normal((B, 1, Hq, D)).astype(np.float32) * 0.3
    kn = rng.standard_normal((B, Hkv, D)).astype(np.float32) * 0.3
    vn = rng.standard_normal((B, Hkv, D)).astype(np.float32) * 0.3
    args = (jnp.asarray(q, jnp.bfloat16), jnp.asarray(kq),
            jnp.asarray(table), jnp.asarray(lengths), jnp.asarray(lengths))
    ref = paged_attention_fa(args[0], args[1], None, args[2], args[3],
                             args[4],
                             k_new=jnp.asarray(kn, jnp.bfloat16),
                             v_new=jnp.asarray(vn, jnp.bfloat16),
                             k_scales=jnp.asarray(ksc), v_scales=None)
    for P, wnd in ((2, None), (4, None), (2, 256)):
        refw = ref if wnd is None else paged_attention_fa(
            args[0], args[1], None, args[2], args[3], args[4],
            sliding_window=wnd,
            k_new=jnp.asarray(kn, jnp.bfloat16),
            v_new=jnp.asarray(vn, jnp.bfloat16),
            k_scales=jnp.asarray(ksc), v_scales=None)
        got = fa_paired(args[0], args[1], args[2], args[3], args[4],
                        jnp.asarray(kn, jnp.bfloat16),
                        jnp.asarray(vn, jnp.bfloat16),
                        jnp.asarray(ksc), pages_per_block=2, pair=P,
                        window=wnd)
        err = float(jnp.max(jnp.abs(refw.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(refw.astype(jnp.float32))) + 1e-9)
        out[f"rel_err_P{P}_w{wnd}"] = rel
        print(f"correctness P={P} window={wnd}: rel {rel}", flush=True)

    # ---- timing at bench shapes ------------------------------------------
    from vis_zephyr_tpu.config import VisZephyrConfig
    cfg = VisZephyrConfig(); dec = cfg.decoder
    B = 128
    L = dec.num_layers
    Hq, Hkv, hd = dec.num_heads, dec.num_kv_heads, dec.head_dim
    prompt = 640
    ppr = -(-(prompt + 4) // ps)
    num_pages = 1 + B * ppr
    kp = jnp.zeros((Hkv, L * num_pages, 2 * ps, hd), jnp.int8)
    ksp = jnp.ones((Hkv, L * num_pages, 1, 2 * ps), jnp.float32)
    table = np.zeros((B, 2048 // ps), np.int32)
    for b in range(B):
        table[b, :ppr] = 1 + b * ppr + np.arange(ppr)
    table = jnp.asarray(table)
    lengths = jnp.full((B,), prompt, jnp.int32)
    PPOOL = num_pages
    q0 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, Hq, hd),
                           jnp.bfloat16)
    knb = jax.random.normal(jax.random.PRNGKey(3), (B, Hkv, hd),
                            jnp.bfloat16)

    def mk(P, ppcb):
        @functools.partial(jax.jit, static_argnames=("n",))
        def attn_scan(kp, ksp, q, n):
            def step(q, _):
                def body(q, i):
                    a = fa_paired(q, kp, table + i * PPOOL, lengths, lengths,
                                  knb, knb, ksp, pages_per_block=ppcb,
                                  pair=P)
                    return a * 0.5 + q * 0.5, None
                q, _ = jax.lax.scan(body, q, jnp.arange(L))
                return q, None
            q, _ = jax.lax.scan(step, q, None, length=n)
            return q
        return attn_scan

    STEPS, REPS = 8, 3
    for P in (2, 4):
        fn = mk(P, 6)
        y = fn(kp, ksp, q0, STEPS); _sync(y)
        t0 = time.perf_counter()
        for _ in range(REPS):
            y = fn(kp, ksp, q0, STEPS)
        _sync(y)
        out[f"paired_P{P}_ms"] = round(
            (time.perf_counter() - t0) / REPS / STEPS * 1e3, 3)
        print(json.dumps(out), flush=True)
