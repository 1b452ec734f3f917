"""Distributed driver plumbing (single-process: broadcasts are pass-through;
the multi-host path is exercised by the driver's dryrun + pod deployments)."""

import numpy as np


def test_broadcast_passthrough_single_process():
    from scalellm_tpu.parallel import multihost

    mi = {"a": np.arange(4), "b": np.ones((2, 2))}
    (out,) = multihost.broadcast_step_inputs(mi)
    assert out is mi


def test_pod_mesh_single_host():
    import jax

    from scalellm_tpu.parallel import multihost

    mesh = multihost.make_pod_mesh(tp=len(jax.devices()))
    assert mesh.shape["tp"] == len(jax.devices())
    assert multihost.collective_smoke_test(mesh)
    assert multihost.is_driver()


def test_distributed_engine_single_process(tmp_path):
    """DistributedLLMEngine degrades to LLMEngine on one process."""
    import tests.fixtures as fixtures
    from scalellm_tpu.engine.distributed import DistributedLLMEngine
    from scalellm_tpu.engine.llm_engine import EngineOptions

    d = str(tmp_path / "m")
    fixtures.make_tiny_llama(d, tokenizer=True)
    eng = DistributedLLMEngine(
        EngineOptions(model_path=d, num_blocks=64, block_size=4, warmup=False)
    )
    from scalellm_tpu.engine.batch import Batch
    from scalellm_tpu.request.sequence import Sequence
    from scalellm_tpu.request.stopping import StoppingCriteria
    from scalellm_tpu.sampling.params import SamplingParams

    seq = Sequence(0, [1, 2, 3], SamplingParams(temperature=0.0),
                   StoppingCriteria())
    assert eng.block_manager.allocate_blocks_for(seq, 4)
    b = Batch()
    b.add(seq, 3)
    eng.execute_model(b)
    assert seq.num_tokens == 4  # one token sampled
