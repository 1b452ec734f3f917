"""SpecExecutor — the whole speculative round as ONE jitted device program.

The reference's SpeculativeEngine drives k draft forwards + 1 target forward
+ rejection sampling from the host (reference:
src/speculative/speculative_engine.cpp:162-236). A literal translation costs
k+2 dispatch/fetch round trips per round — on TPU (and especially over a
networked runtime) that dominates the draft model's actual compute. Here the
draft loop is a `lax.scan` INSIDE one jitted program: draft k steps (each
writing draft KV in place), assemble the (k+1)-token target window from the
draft outputs on device, run the target forward, rejection-sample on device,
and return only the small accepted/draft id arrays to the host.

TP composes naturally: the whole program is wrapped in one shard_map over
the mesh, with the target's and draft's own param partition specs
(the reference runs its TP engine inside SpeculativeEngine the same way,
speculative_engine.cpp:162 — but with per-GPU threads).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from scalellm_tpu.engine.params import ModelInputs, SamplingInputs
from scalellm_tpu.speculative.rejection_sampler import rejection_sample


@jax.tree_util.register_dataclass
@dataclass
class SpecInputs:
    """Host-prepared inputs for one fused speculative round (S = padded)."""

    first_tokens: np.ndarray  # [S] i32 — last committed token per sequence
    positions0: np.ndarray  # [S] i32 — position of first_tokens
    slot_ids: np.ndarray  # [S, k+1] i32 — KV slots for positions p0..p0+k
    block_tables: np.ndarray  # [S, MAXP] i32
    seq_mask: np.ndarray  # [S] f32
    num_seqs: np.ndarray  # [1] i32
    do_sample: np.ndarray  # [S] bool
    seeds: np.ndarray  # [S] u32


class SpecExecutor:
    """Owns the fused draft-scan + target-verify + rejection program.

    Both engines' Executors keep owning their params/KV; this class borrows
    them per call and writes the donated KV caches back.
    """

    def __init__(self, target_executor, draft_executor, k: int,
                 mesh: Optional[Mesh] = None):
        self.target = target_executor
        self.draft = draft_executor
        self.k = k
        self.mesh = mesh

    @functools.cached_property
    def _spec_fn(self):
        k = self.k
        t_model = self.target.model
        d_model = self.draft.model
        from scalellm_tpu.sampling.sampler import process_logits, sample

        def spec_fn(t_params, d_params, t_kv, d_kv, inp: SpecInputs,
                    si: SamplingInputs):
            S = inp.first_tokens.shape[0]
            seg = jnp.arange(S, dtype=jnp.int32)
            cu1 = jnp.arange(S + 1, dtype=jnp.int32)

            def draft_step(carry, i):
                d_kv, tokens = carry
                mi = ModelInputs(
                    token_ids=tokens,
                    positions=inp.positions0 + i,
                    token_seg=seg,
                    new_kv_slot_ids=inp.slot_ids[:, i],
                    block_tables=inp.block_tables,
                    kv_lens=(inp.positions0 + i + 1)
                    * (inp.seq_mask > 0).astype(jnp.int32),
                    cu_q_lens=cu1,
                    num_seqs=inp.num_seqs,
                    selected_idxes=seg,
                    seq_mask=inp.seq_mask,
                )
                hidden, d_kv = d_model.forward(d_params, d_kv, mi)
                logits = d_model.logits(d_params, hidden)  # [S, V]
                processed = process_logits(logits, si)
                probs = jax.nn.softmax(processed, axis=-1)
                step_seeds = (inp.seeds + (i + 1).astype(jnp.uint32) * jnp.uint32(
                    2654435761
                )).astype(jnp.uint32)
                nt = sample(processed, inp.do_sample, step_seeds).astype(jnp.int32)
                return (d_kv, nt), (nt, probs)

            (d_kv, _), (d_ids, d_probs) = jax.lax.scan(
                draft_step, (d_kv, inp.first_tokens),
                jnp.arange(k, dtype=jnp.int32),
            )
            d_ids = d_ids.T  # [S, k]
            d_probs = d_probs.transpose(1, 0, 2)  # [S, k, V]

            # ---- target verification over the k+1-token window per sequence
            tok = jnp.concatenate([inp.first_tokens[:, None], d_ids], axis=1)
            positions = inp.positions0[:, None] + jnp.arange(
                k + 1, dtype=jnp.int32
            )
            mi_t = ModelInputs(
                token_ids=tok.reshape(-1),
                positions=positions.reshape(-1),
                token_seg=jnp.repeat(seg, k + 1),
                new_kv_slot_ids=inp.slot_ids.reshape(-1),
                block_tables=inp.block_tables,
                kv_lens=(inp.positions0 + k + 1)
                * (inp.seq_mask > 0).astype(jnp.int32),
                cu_q_lens=cu1 * (k + 1),
                num_seqs=inp.num_seqs,
                selected_idxes=jnp.arange(S * (k + 1), dtype=jnp.int32),
                seq_mask=inp.seq_mask,
            )
            hidden, t_kv = t_model.forward(t_params, t_kv, mi_t)
            logits = t_model.logits(t_params, hidden)  # [S*(k+1), V]
            si_rep = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, k + 1, axis=0), si
            )
            V = logits.shape[-1]
            processed = process_logits(logits, si_rep).reshape(S, k + 1, V)
            t_probs = jax.nn.softmax(processed, axis=-1)

            accepted = rejection_sample(
                d_ids, d_probs, t_probs, inp.do_sample, inp.seeds
            )  # [S, k+1]
            return accepted, d_ids, t_kv, d_kv

        if self.mesh is None:
            return jax.jit(spec_fn, donate_argnums=(2, 3))

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        rep = P()
        inp_specs = SpecInputs(
            first_tokens=rep, positions0=rep, slot_ids=rep, block_tables=rep,
            seq_mask=rep, num_seqs=rep, do_sample=rep, seeds=rep,
        )
        si_specs = jax.tree_util.tree_map(lambda _: rep, SamplingInputs(
            temperatures=0, top_ks=0, top_ps=0, frequency_penalties=0,
            presence_penalties=0, repetition_penalties=0, unique_token_ids=0,
            unique_token_counts=0, bias_token_ids=0, bias_values=0,
            allowed_mask=0, seeds=0,
        ))
        sharded = shard_map(
            spec_fn,
            mesh=self.mesh,
            in_specs=(
                t_model.param_partition_specs(),
                d_model.param_partition_specs(),
                t_model.kv_cache_partition_spec(),
                d_model.kv_cache_partition_spec(),
                inp_specs,
                si_specs,
            ),
            out_specs=(rep, rep, t_model.kv_cache_partition_spec(),
                       d_model.kv_cache_partition_spec()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(2, 3))

    def execute(self, inp: SpecInputs, si: SamplingInputs) -> Tuple[np.ndarray, np.ndarray]:
        """Run one fused speculative round; returns (accepted [S, k+1],
        draft_ids [S, k]) as numpy. KV caches update in place (donated)."""
        inp_dev = jax.tree_util.tree_map(jnp.asarray, inp)
        si_dev = jax.tree_util.tree_map(jnp.asarray, si)
        accepted, d_ids, t_kv, d_kv = self._spec_fn(
            self.target.params, self.draft.params,
            self.target.kv_cache, self.draft.kv_cache,
            inp_dev, si_dev,
        )
        self.target.kv_cache = t_kv
        self.draft.kv_cache = d_kv
        return np.asarray(accepted), np.asarray(d_ids)
