"""Executor — compiles and runs the per-step model program.

TPU-native equivalent of the reference's Worker + ModelRunner
(reference: src/engine/worker.cpp:125 execute_model,
src/engine/model_runner.cpp:112 forward with CUDA-graph replay). Instead of
N worker threads with NCCL communicators, ONE jitted XLA program is sharded
over the device mesh by shard_map; instead of CUDA-graph capture per
batch-size bucket, jax.jit's compilation cache keys on the padded bucket
shapes produced by Batch.prepare_model_inputs — each (T, S, MAXP) bucket
compiles exactly once and replays thereafter.

KV caches are donated every step so XLA updates them in place (the analog of
the reference's persistent KVCache tensors, src/memory/kv_cache.h:10).
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scalellm_tpu.engine.params import ModelInputs, ModelOutputs, SamplingInputs
from scalellm_tpu.sampling.sampler import sample_tokens

logger = logging.getLogger(__name__)


class Executor:
    """Owns device params + KV caches and the jitted step program."""

    def __init__(
        self,
        model,
        params,  # host (numpy) or device pytree, GLOBAL shapes
        mesh: Optional[Mesh] = None,
        max_top_logprobs: int = 0,
    ):
        self.model = model
        self.mesh = mesh
        self.max_top_logprobs = max_top_logprobs

        # fp16 checkpoints compute as bf16 (no fp16 on the TPU path).
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.bfloat16}[
            model.args.dtype
        ]

        def to_dtype(x):
            x = jnp.asarray(x)
            # Quantized params (int8 qweights/zeros) and scales keep their
            # storage dtype; only activations-dtype floats are cast.
            if jnp.issubdtype(x.dtype, jnp.integer):
                return x
            if x.dtype == jnp.float32 and dtype != jnp.float32:
                return x.astype(dtype)
            return x.astype(dtype) if x.dtype != dtype else x

        # Multi-host pod: the mesh spans processes, so arrays must be built
        # as GLOBAL jax.Arrays (each process contributes its addressable
        # shards via callback) instead of single-process device_puts.
        self._multiprocess = mesh is not None and jax.process_count() > 1

        def put_global(x, spec):
            import ml_dtypes

            arr = np.asarray(x)
            if not np.issubdtype(arr.dtype, np.integer):
                # same float policy as to_dtype: activations dtype
                arr = arr.astype(
                    ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.float32
                )
            s = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                arr.shape, s, lambda idx, a=arr: a[idx]
            )

        if mesh is not None:
            specs = model.param_partition_specs()
            if self._multiprocess:
                self.params = jax.tree_util.tree_map_with_path(
                    lambda path, x: put_global(x, _spec_at(specs, path)), params
                )
            else:
                self.params = jax.tree_util.tree_map_with_path(
                    lambda path, x: jax.device_put(
                        to_dtype(x), NamedSharding(mesh, _spec_at(specs, path))
                    ),
                    params,
                )
        else:
            import os

            if os.environ.get("SCALELLM_FAKE_LOAD") == "zero":
                # Synthetic-weights benches: allocate zeros ON DEVICE (an
                # XLA fill) instead of streaming host zeros through the
                # interconnect — GBs of pointless transfer otherwise.
                def dev_zeros(x):
                    x = np.asarray(x)
                    if np.issubdtype(x.dtype, np.integer):
                        return jnp.zeros(x.shape, x.dtype)
                    if x.dtype == np.float32 and dtype == jnp.float32:
                        return jnp.zeros(x.shape, jnp.float32)
                    return jnp.zeros(x.shape, dtype)

                self.params = jax.tree_util.tree_map(dev_zeros, params)
            else:
                self.params = jax.tree_util.tree_map(
                    lambda x: jax.device_put(to_dtype(x)), params
                )
        self.kv_cache = None
        self._kv_dtype = (
            jnp.int8 if getattr(model, "kv_quant", False) else dtype
        )
        # Compile-cache telemetry: any jit cache growth outside warmup is a
        # cold mid-serve compile (seconds of added latency) — counted so the
        # serving bench can assert zero.
        self._last_cache_size: Optional[int] = None
        self._in_warmup = False
        # Multi-step decode programs, keyed (num_steps, page_size).
        self._multi_fns: dict = {}

    # ---------------------------------------------------------------- kv init

    def init_kv_cache(self, num_blocks: int, block_size: int) -> None:
        """Allocate the paged KV cache arrays
        (reference: llm_engine.cpp:309 init_kv_cache)."""
        shape = self.model.kv_cache_shape(num_blocks, block_size)
        if self._multiprocess:
            import ml_dtypes

            sharding = NamedSharding(self.mesh, self.model.kv_cache_partition_spec())
            np_dtype = (
                ml_dtypes.bfloat16
                if self._kv_dtype == jnp.bfloat16
                else np.dtype(jnp.dtype(self._kv_dtype).name)
            )

            def zeros_shard(idx):
                sh = tuple(
                    len(range(*s.indices(dim))) for s, dim in zip(idx, shape)
                )
                return np.zeros(sh, np_dtype)

            self.kv_cache = jax.make_array_from_callback(shape, sharding, zeros_shard)
        elif self.mesh is not None:
            sharding = NamedSharding(self.mesh, self.model.kv_cache_partition_spec())
            self.kv_cache = jax.device_put(
                jnp.zeros(shape, dtype=self._kv_dtype), sharding
            )
        else:
            self.kv_cache = jnp.zeros(shape, dtype=self._kv_dtype)

    def kv_cache_hbm_bytes(self, num_blocks: int, block_size: int) -> int:
        shape = self.model.kv_cache_shape(num_blocks, block_size)
        return int(np.prod(shape)) * jnp.dtype(self._kv_dtype).itemsize

    # ------------------------------------------------------------- kv swap

    @functools.cache
    def _gather_pages_fn(self, n: int):
        return jax.jit(lambda kv, ids: kv[:, ids])

    @functools.cache
    def _scatter_pages_fn(self, n: int):
        return jax.jit(
            lambda kv, ids, data: kv.at[:, ids].set(data),
            donate_argnums=(0,),
        )

    @staticmethod
    def _page_bucket(n: int) -> int:
        return 1 << (n - 1).bit_length()  # pow2 page-count buckets

    def fetch_pages(self, page_ids: np.ndarray) -> np.ndarray:
        """Device -> host copy of the given KV pages: [L, n, ps, 2H, D].
        Page counts are padded to pow2 buckets (ids repeat the last page)
        so the gather program compiles O(log) times, not once per count."""
        n = len(page_ids)
        b = self._page_bucket(n)
        ids = np.concatenate(
            [page_ids, np.full(b - n, page_ids[-1], np.int32)]
        )
        out = self._gather_pages_fn(b)(self.kv_cache, jnp.asarray(ids))
        return np.asarray(out[:, :n])

    def fetch_pages_async(self, page_ids: np.ndarray):
        """Non-blocking fetch_pages: dispatches the gather and starts the
        device->host DMA, returning the jax array immediately (materialize
        with np.asarray once the transfer drains). Lets KV swap-out staging
        overlap the next engine step instead of stalling the host on it."""
        n = len(page_ids)
        b = self._page_bucket(n)
        ids = np.concatenate(
            [page_ids, np.full(b - n, page_ids[-1], np.int32)]
        )
        out = self._gather_pages_fn(b)(self.kv_cache, jnp.asarray(ids))
        out = out[:, :n]
        try:
            out.copy_to_host_async()
        except Exception:  # backend without async host copies: stays lazy
            pass
        return out

    def restore_pages(self, page_ids: np.ndarray, data: np.ndarray) -> None:
        """Host -> device scatter of staged pages into new slots (in place:
        the cache array is donated). Padding repeats the last (id, page)
        pair — an idempotent duplicate write."""
        n = len(page_ids)
        assert data.shape[1] == n
        b = self._page_bucket(n)
        ids = np.concatenate(
            [page_ids, np.full(b - n, page_ids[-1], np.int32)]
        )
        data = np.concatenate(
            [data, np.repeat(data[:, -1:], b - n, axis=1)], axis=1
        )
        self.kv_cache = self._scatter_pages_fn(b)(
            self.kv_cache, jnp.asarray(ids), jnp.asarray(data)
        )

    # ---------------------------------------------------------------- step fn

    def _build_step_fn(self, decode_only: bool = False):
        """The per-step program: forward → logits → sample. decode_only
        compiles the all-decode variant (in-house decode attention)."""
        model = self.model
        max_k = self.max_top_logprobs

        def step(params, kv_cache, mi: ModelInputs, si: SamplingInputs):
            hidden, new_kv = model.forward(
                params, kv_cache, mi, decode_only=decode_only
            )
            logits = model.logits(params, hidden)
            outs = sample_tokens(logits, si, max_top_logprobs=max_k)
            return outs, new_kv

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(1,))

        # TP: shard_map with explicit collectives inside the model.
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        mi_specs, si_specs, out_specs = self._shard_specs()
        sharded = shard_map(
            step,
            mesh=self.mesh,
            in_specs=(
                model.param_partition_specs(),
                model.kv_cache_partition_spec(),
                mi_specs,
                si_specs,
            ),
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(1,))

    def _multi_step_fn_for(self, num_steps: int, page_size: int):
        key = (num_steps, page_size)
        fn = self._multi_fns.get(key)
        if fn is None:
            fn = self._multi_fns[key] = self._build_multi_step_fn(
                num_steps, page_size
            )
        return fn

    def _build_multi_step_fn(self, num_steps: int, page_size: int):
        """N-micro-step decode program: one dispatch runs `num_steps`
        autoregressive decode steps as a device-side lax.scan with in-graph
        token feedback — the host pays ONE round trip (and one batch prep)
        per N tokens instead of per token. The analog of vLLM's multi-step
        scheduling, natural on TPU where the whole loop jits into one XLA
        program (reference's per-step loop: continuous_scheduler.cpp:384).

        Decode-only batches (1 query token/seq). Per micro-step i:
        positions/kv_lens advance by i and each token's KV slot is
        recomputed from the block tables (slots may cross page boundaries).
        Overshoot past a sequence's allocated pages indexes the zero-padded
        block-table tail, landing writes in reserved page 0 — harmless.
        Sampler seeds are re-folded per micro-step so temperature sampling
        doesn't repeat."""
        import dataclasses

        model = self.model
        max_k = self.max_top_logprobs

        def multi(params, kv_cache, mi: ModelInputs, si: SamplingInputs):
            def body(carry, i):
                kv_cache, tokens = carry
                pos = mi.positions + i
                page = pos // page_size
                page = jnp.minimum(page, mi.block_tables.shape[1] - 1)
                bids = mi.block_tables[mi.token_seg, page]
                # Bucket-padding rows carry token_seg=0 and would otherwise
                # recompute slots into sequence 0's REAL pages (they'd
                # overwrite its first KV block with garbage — caught by the
                # ms-vs-single equivalence tests once the scheduler actually
                # routed batches here). Pin them to reserved page 0 like the
                # host-side prepare does.
                T = mi.token_ids.shape[0]
                valid = (
                    jnp.arange(T, dtype=jnp.int32)
                    < mi.cu_q_lens[mi.num_seqs[0]]
                )
                slots = jnp.where(
                    valid, bids * page_size + pos % page_size, 0
                )
                mi_i = dataclasses.replace(
                    mi,
                    token_ids=tokens,
                    positions=pos,
                    new_kv_slot_ids=slots,
                    kv_lens=mi.kv_lens + i,
                )
                hidden, kv_cache = model.forward(
                    params, kv_cache, mi_i, decode_only=True
                )
                logits = model.logits(params, hidden)
                si_i = dataclasses.replace(
                    si,
                    seeds=si.seeds
                    + i.astype(jnp.uint32) * jnp.uint32(2654435761),
                )
                outs = sample_tokens(logits, si_i, max_top_logprobs=max_k)
                nxt = outs.next_tokens[mi.token_seg].astype(tokens.dtype)
                return (kv_cache, nxt), outs

            (kv_cache, _), outs = jax.lax.scan(
                body, (kv_cache, mi.token_ids), jnp.arange(num_steps)
            )
            return outs, kv_cache  # outs leaves carry a leading [N] dim

        if self.mesh is None:
            return jax.jit(multi, donate_argnums=(1,))

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        mi_specs, si_specs, out_specs = self._shard_specs()
        sharded = shard_map(
            multi,
            mesh=self.mesh,
            in_specs=(
                model.param_partition_specs(),
                model.kv_cache_partition_spec(),
                mi_specs,
                si_specs,
            ),
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(1,))

    def execute_multi(
        self,
        mi: ModelInputs,
        si: SamplingInputs,
        num_steps: int,
        page_size: int,
    ):
        """Run `num_steps` decode micro-steps in one dispatch; returns
        ModelOutputs whose leaves have a leading [num_steps] dim. KV caches
        update in place (donated). Single-process only (the multi-host
        driver broadcasts one step at a time)."""
        assert self.kv_cache is not None, "init_kv_cache first"
        assert not self._multiprocess
        mi = jax.tree_util.tree_map(jnp.asarray, mi)
        si = jax.tree_util.tree_map(jnp.asarray, si)
        outs, self.kv_cache = self._multi_step_fn_for(num_steps, page_size)(
            self.params, self.kv_cache, mi, si
        )
        self._note_cache_size(mi)
        return outs

    def _shard_specs(self):
        """(mi, si, (outs, kv)) PartitionSpecs for the shard_map step: step
        inputs/sampling outputs are replicated; only params + KV shard."""
        replicated = P()
        mi_specs = ModelInputs(
            token_ids=replicated,
            positions=replicated,
            token_seg=replicated,
            new_kv_slot_ids=replicated,
            block_tables=replicated,
            kv_lens=replicated,
            cu_q_lens=replicated,
            num_seqs=replicated,
            selected_idxes=replicated,
            seq_mask=replicated,
            lora_ids=replicated
            if getattr(self.model, "lora_meta", None) is not None
            else None,
        )
        si_specs = SamplingInputs(
            temperatures=replicated,
            top_ks=replicated,
            top_ps=replicated,
            frequency_penalties=replicated,
            presence_penalties=replicated,
            repetition_penalties=replicated,
            unique_token_ids=replicated,
            unique_token_counts=replicated,
            bias_token_ids=replicated,
            bias_values=replicated,
            allowed_mask=replicated,
            seeds=replicated,
        )
        out_specs = (
            ModelOutputs(
                next_tokens=replicated,
                logprobs=replicated,
                top_ids=replicated,
                top_logprobs=replicated,
            ),
            self.model.kv_cache_partition_spec(),
        )
        return mi_specs, si_specs, out_specs

    @functools.cache
    def _step_fn_for(self, decode_only: bool):
        # decode_only compiles a separate program only for models with a
        # decode-specialized attention kernel (MLA latent-MQA decode,
        # ops/mla_attention.py). Dense models use the stock ragged kernel
        # for both shapes — share the compile. (A generic in-house decode
        # kernel was measured and deleted: it reached parity at b=1 but
        # lost 19-39% to the stock kernel's pipelined grid at batch;
        # see commit history of ops/decode_attention.py.)
        if decode_only and not getattr(self.model, "mla", False):
            return self._step_fn_for(False)
        return self._build_step_fn(decode_only)

    @property
    def _step_fn(self):
        return self._step_fn_for(False)

    def _build_score_step_fn(self, k: int):
        """Step variant that ALSO scores the prompt: teacher-forced logprob
        of targets[t] at every batch position t (+ top-k alternatives),
        computed from the same prefill pass (no extra forward) — the engine
        side of SamplingParams.prompt_logprobs. The lm_head runs chunked
        over T so the [C, V] logits never materialize at full [T, V]."""
        model = self.model
        max_k = self.max_top_logprobs

        def step(params, kv_cache, mi: ModelInputs, si: SamplingInputs, targets):
            h, new_kv = model.forward(params, kv_cache, mi, all_hidden=True)
            outs = sample_tokens(
                model.logits(params, h[mi.selected_idxes]), si,
                max_top_logprobs=max_k,
            )
            T, D = h.shape
            C = 128 if T % 128 == 0 else T
            def score_chunk(args):
                hc, tc = args
                lp = jax.nn.log_softmax(
                    model.logits(params, hc).astype(jnp.float32), axis=-1
                )
                tlp = jnp.take_along_axis(lp, tc[:, None], axis=1)[:, 0]
                if k > 0:
                    top_lp, top_id = jax.lax.top_k(lp, k)
                else:
                    top_lp = jnp.zeros((C, 0), jnp.float32)
                    top_id = jnp.zeros((C, 0), jnp.int32)
                return tlp, top_id, top_lp

            tlp, top_id, top_lp = jax.lax.map(
                score_chunk,
                (h.reshape(T // C, C, D), targets.reshape(T // C, C)),
            )
            scores = (
                tlp.reshape(T),
                top_id.reshape(T, k).astype(jnp.int32),
                top_lp.reshape(T, k),
            )
            return outs, new_kv, scores

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(1,))

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        replicated = P()
        mi_specs, si_specs, out_specs = self._shard_specs()
        sharded = shard_map(
            step,
            mesh=self.mesh,
            in_specs=(
                self.model.param_partition_specs(),
                self.model.kv_cache_partition_spec(),
                mi_specs, si_specs, replicated,
            ),
            out_specs=out_specs + ((replicated, replicated, replicated),),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(1,))

    @functools.cache
    def _score_step_fn(self, k: int):
        return self._build_score_step_fn(k)

    # ---------------------------------------------------------------- execute

    def execute(
        self,
        mi: ModelInputs,
        si: SamplingInputs,
        score_targets=None,  # [T] int32 — enables prompt scoring
        score_top_k: int = 0,
        decode_only: bool = False,  # STATIC: all-decode batch (1 q tok/seq)
    ):
        """Run one step; KV caches are updated in place (donated).

        Returns ModelOutputs; with score_targets set, (ModelOutputs,
        (target_logprobs [T], top_ids [T, k], top_logprobs [T, k])) — the
        prompt-logprob scores of this step's batch positions."""
        assert self.kv_cache is not None, "init_kv_cache first"
        if self._multiprocess:
            # Step inputs are identical on every host (host-0 broadcast);
            # assemble them as replicated GLOBAL arrays for the pod jit.
            rep = NamedSharding(self.mesh, P())

            def to_global(x):
                a = np.asarray(x)
                return jax.make_array_from_callback(
                    a.shape, rep, lambda idx, a=a: a[idx]
                )

            mi = jax.tree_util.tree_map(to_global, mi)
            si = jax.tree_util.tree_map(to_global, si)
            if score_targets is not None:
                score_targets = to_global(np.asarray(score_targets, np.int32))
        else:
            mi = jax.tree_util.tree_map(jnp.asarray, mi)
            si = jax.tree_util.tree_map(jnp.asarray, si)
        scores = None
        if score_targets is not None:
            targets = jnp.asarray(np.asarray(score_targets, np.int32)) \
                if not self._multiprocess else score_targets
            outs, self.kv_cache, scores = self._score_step_fn(score_top_k)(
                self.params, self.kv_cache, mi, si, targets
            )
        else:
            outs, self.kv_cache = self._step_fn_for(decode_only)(
                self.params, self.kv_cache, mi, si
            )
        self._note_cache_size(mi)
        if scores is not None:
            return outs, scores
        return outs

    def _note_cache_size(self, mi: ModelInputs) -> None:
        size = self._jit_cache_size()
        if size is not None:
            if (
                self._last_cache_size is not None
                and size > self._last_cache_size
                and not self._in_warmup
            ):
                from scalellm_tpu.utils.metrics import COUNTERS

                COUNTERS.inc("num_mid_serve_compiles", size - self._last_cache_size)
                logger.info(
                    "mid-serve compile: bucket T=%d S=%d MAXP=%d",
                    mi.token_ids.shape[0],
                    mi.kv_lens.shape[0],
                    mi.block_tables.shape[1],
                )
            self._last_cache_size = size

    def _jit_cache_size(self) -> Optional[int]:
        try:
            return sum(
                self._step_fn_for(flag)._cache_size()
                for flag in (False, True)
            ) + sum(fn._cache_size() for fn in self._multi_fns.values())
        except Exception:
            return None

    def warmup(
        self,
        block_size: int,
        mode: str = "fast",
        max_tokens: int = 512,
        max_seqs: int = 128,
        max_context_len: int = 4096,
        multi_steps: int = 1,
    ) -> None:
        """Pre-compile serving buckets — the analog of CUDA-graph capture at
        init (reference: llm_engine.cpp:214 capture_cuda_graphs, 9 buckets).

        mode "fast": the two cheapest buckets (tests / interactive startup).
        mode "full": every (T, S, MAXP) bucket reachable under the serving
        envelope — the decode ladder (T tracks S) plus chunked-prefill
        buckets at the token budget, across the page-bucket growth path.
        With the persistent XLA compile cache this cost is paid once ever;
        afterwards serving hits zero cold compiles (counter
        num_mid_serve_compiles stays 0).
        """
        from scalellm_tpu.engine.batch import (
            PAGE_BUCKETS,
            SEQ_BUCKETS,
            TOKEN_BUCKETS,
            pick_bucket,
        )

        if mode == "off":
            return
        if mode == "fast":
            buckets = [
                (16, 1, PAGE_BUCKETS[0], True),
                (16, 8, PAGE_BUCKETS[0], True),
            ]
        else:
            pages_env = pick_bucket(
                PAGE_BUCKETS, max(max_context_len // block_size, 1)
            )
            maxps = [b for b in PAGE_BUCKETS if b <= pages_env]
            s_env = pick_bucket(SEQ_BUCKETS, max(max_seqs, 1))
            t_pre = pick_bucket(TOKEN_BUCKETS, min(max_tokens, TOKEN_BUCKETS[-1]))
            bucket_set = set()
            for S in SEQ_BUCKETS:
                if S > s_env:
                    break
                for mp in maxps:
                    # decode: one new token per sequence (T tracks S);
                    # compiled with the decode-specialized attention
                    bucket_set.add(
                        (pick_bucket(TOKEN_BUCKETS, S), S, mp, True)
                    )
                    # chunked prefill / mixed: full token budget at this S
                    bucket_set.add((t_pre, S, mp, False))
            buckets = sorted(bucket_set)

        import time

        t0 = time.monotonic()
        self._in_warmup = True
        try:
            for T, S, MAXP, decode_only in buckets:
                # A minimal VALID batch (1 seq, 1 query token, KV on the
                # reserved padding page) — not all-zero: the attention
                # kernel faults the TPU on num_seqs=0 buckets when the
                # model stores a single KV head (MQA / packed head_dim-64),
                # and the fault surfaces asynchronously at the next fetch.
                # Shapes alone determine what gets compiled.
                kv_lens = np.zeros(S, np.int32)
                kv_lens[0] = 1
                cu_q_lens = np.ones(S + 1, np.int32)
                cu_q_lens[0] = 0
                mi = ModelInputs(
                    token_ids=np.zeros(T, np.int32),
                    positions=np.zeros(T, np.int32),
                    token_seg=np.zeros(T, np.int32),
                    new_kv_slot_ids=np.zeros(T, np.int32),
                    block_tables=np.zeros((S, MAXP), np.int32),
                    kv_lens=kv_lens,
                    cu_q_lens=cu_q_lens,
                    num_seqs=np.ones(1, np.int32),
                    selected_idxes=np.zeros(S, np.int32),
                    seq_mask=np.zeros(S, np.float32),
                    lora_ids=np.zeros(S, np.int32)
                    if getattr(self.model, "lora_meta", None) is not None
                    else None,
                )
                si = SamplingInputs(
                    temperatures=np.zeros(S, np.float32),
                    top_ks=np.zeros(S, np.int32),
                    top_ps=np.ones(S, np.float32),
                    frequency_penalties=np.zeros(S, np.float32),
                    presence_penalties=np.zeros(S, np.float32),
                    repetition_penalties=np.ones(S, np.float32),
                    unique_token_ids=np.zeros((S, 1), np.int32),
                    unique_token_counts=np.zeros((S, 1), np.int32),
                    bias_token_ids=np.zeros((S, 1), np.int32),
                    bias_values=np.zeros((S, 1), np.float32),
                    allowed_mask=np.full((S, 1), 0xFFFFFFFF, np.uint32),
                    seeds=np.zeros(S, np.uint32),
                )
                self.execute(mi, si, decode_only=decode_only)
                if multi_steps > 1 and decode_only and not self._multiprocess:
                    # Multi-step serving also replays the N-step decode
                    # program on every decode bucket — warm it too.
                    self.execute_multi(mi, si, multi_steps, block_size)
        finally:
            self._in_warmup = False
        logger.info(
            "warmed %d buckets (%s) in %.1fs",
            len(buckets), mode, time.monotonic() - t0,
        )


def _spec_at(specs, path):
    """Look up the PartitionSpec for a pytree path (DictKey components)."""
    node = specs
    for key in path:
        node = node[key.key]
    return node
