import numpy as np, sys, bench
from poccala_tpu.config import Config
from poccala_tpu.ops.frontend import Frontend
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_poccala")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
cfg = Config(); cfg.model.state_num=5; cfg.model.mix_level=8; cfg.model.max_mix_level=8
fe = Frontend(cfg.frontend)
rng = np.random.default_rng(0)
bench.bench_decode(cfg, fe, rng)
