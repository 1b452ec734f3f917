"""Tensor/expert parallel equivalence on the fake 8-device CPU mesh:
sharded execution must produce the same greedy tokens as single-device
(mirrors the role of the reference's process_group_test + the multi-device
coverage it lacked, SURVEY §4.4)."""

import numpy as np
import pytest


def _mesh(tp):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()[:tp]
    return Mesh(np.array(devices).reshape(1, tp), ("dp", "tp"))


def _greedy_step(model_dir, mesh, tp, sp=False):
    import jax

    from scalellm_tpu.engine.batch import Batch
    from scalellm_tpu.engine.executor import Executor
    from scalellm_tpu.model_loader import HFModelLoader
    from scalellm_tpu.models.registry import ModelRegistry
    from scalellm_tpu.parallel.config import ParallelConfig

    loader = HFModelLoader(model_dir)
    loader.model_args.dtype = "float32"
    parallel = ParallelConfig(
        tp_axis="tp" if tp > 1 else None, tp_size=tp if mesh else 1, sp=sp
    )
    factory = ModelRegistry.get_causal_lm_factory(loader.model_type)
    model = factory(loader.model_args, parallel)
    params = loader.load_params(model)
    ex = Executor(model, params, mesh=mesh)
    ex.init_kv_cache(num_blocks=16, block_size=4)

    from scalellm_tpu.request.sequence import Sequence
    from scalellm_tpu.request.stopping import StoppingCriteria
    from scalellm_tpu.sampling.params import SamplingParams

    seq = Sequence(0, [3, 17, 42, 9, 101], SamplingParams(temperature=0.0),
                   StoppingCriteria())
    # manual block assignment: blocks 1,2
    class _B:
        def __init__(self, i): self.id, self.size = i, 4
        def dec_ref(self): pass
    seq.blocks = [_B(1), _B(2)]
    b = Batch()
    b.add(seq, 5)
    mi, si, _ = b.prepare_model_inputs(4)
    outs = ex.execute(mi, si)
    return int(np.asarray(outs.next_tokens)[0])


def _make_zoo_checkpoint(tmp_path, family):
    from tests.test_model_zoo import make_checkpoint

    return make_checkpoint(tmp_path, family)[0]


@pytest.mark.parametrize(
    "family,tp",
    [("llama", 4), ("mixtral", 4), ("qwen2", 2), ("deepseek_v2", 2)],
)
def test_tp_matches_single_device(tmp_path, family, tp):
    d = _make_zoo_checkpoint(tmp_path, family)
    single = _greedy_step(d, None, 1)
    sharded = _greedy_step(d, _mesh(tp), tp)
    assert single == sharded


@pytest.mark.parametrize("family,tp", [("llama", 4), ("qwen2", 2)])
def test_sequence_parallel_matches_single_device(tmp_path, family, tp):
    """Megatron SP (token-sharded norms/residuals, AG+RS instead of AR)
    must be numerically equivalent to single-device execution."""
    d = _make_zoo_checkpoint(tmp_path, family)
    single = _greedy_step(d, None, 1)
    sharded = _greedy_step(d, _mesh(tp), tp, sp=True)
    assert single == sharded


def test_quantized_tp_matches_single_device(tmp_path):
    """INT4 checkpoint under TP=2: fused quant params shard-interleave must
    preserve results."""
    import tests.fixtures as fixtures
    import tests.test_quantization as tq

    src = str(tmp_path / "src")
    fixtures.make_tiny_llama(src, tokenizer=True)
    qdir, _ = tq._quantize_checkpoint(src, str(tmp_path / "awq"), "awq")
    single = _greedy_step(qdir, None, 1)
    sharded = _greedy_step(qdir, _mesh(2), 2)
    assert single == sharded
