"""Self-organizing-map clustering and particle-swarm optimization.

Replaces the reference's leaf modules ``StatisticalModel/ANN.py:26-137``
(``som``, ``p_som``) and ``StatisticalModel/EA.py:23-127`` (particle
swarm with linearly-decaying inertia), reachable there via
``ClusterInitialization.som`` (``Clustering.py:1176-1183``).  Both are
rewritten as scan-based device programs: the SOM scans over training
steps with vectorized BMU search; PSO scans over iterations with the
whole swarm updated at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from poccala_tpu.ops.distance import pairwise_euclidean


@functools.partial(jax.jit, static_argnames=("num_neurons", "steps"))
def som(
    key,
    x: jax.Array,
    num_neurons: int,
    sigma0: float = 0.6,
    tau1: float = 20.0,
    eta0: float = 0.6,
    tau2: float = 20.0,
    steps: int = 500,
    weights0: jax.Array | None = None,
):
    """Train a 1-D SOM (``ANN.som``, ``ANN.py:46-83``).

    Exponentially-decaying neighborhood width ``σ(t) = σ0·exp(-t/τ1)``
    and learning rate ``η(t) = η0·exp(-t/τ2)`` (``ANN.py:60-63``); each
    step presents one sample (cycled), finds the best-matching unit and
    pulls neighbors toward it with a Gaussian neighborhood.

    :param x: ``[N, D]`` data
    :returns: (``weights [num_neurons, D]``, ``assign [N]``)
    """
    n, d = x.shape
    key, wkey, skey = jax.random.split(key, 3)
    if weights0 is None:
        weights0 = jax.random.uniform(wkey, (num_neurons, d), dtype=x.dtype)
    neuron_pos = jnp.arange(num_neurons, dtype=x.dtype)
    # random presentation order (the reference cycles sequentially, which
    # couples convergence to dataset ordering; shuffled presentation is
    # the standard cure)
    sample_idx = jax.random.randint(skey, (steps,), 0, n)

    def step(weights, t):
        xi = x[sample_idx[t]]
        dist = jnp.sum((weights - xi[None, :]) ** 2, axis=-1)
        bmu = jnp.argmin(dist)
        tt = t.astype(x.dtype)
        sigma = sigma0 * jnp.exp(-tt / tau1)
        eta = eta0 * jnp.exp(-tt / tau2)
        h = jnp.exp(
            -((neuron_pos - neuron_pos[bmu]) ** 2)
            / jnp.maximum(2.0 * sigma * sigma, 1e-12)
        )
        weights = weights + eta * h[:, None] * (xi[None, :] - weights)
        return weights, None

    weights, _ = jax.lax.scan(step, weights0, jnp.arange(steps))
    assign = jnp.argmin(pairwise_euclidean(x, weights), axis=-1)
    return weights, assign


def quantization_error(weights, x):
    """Mean distance of each point to its BMU (the PSO fitness for SOM
    initialization)."""
    return jnp.mean(jnp.min(pairwise_euclidean(x, weights), axis=-1))


@functools.partial(
    jax.jit, static_argnames=("objective", "num_particles", "dim", "iters")
)
def pso(
    key,
    objective,
    num_particles: int,
    dim: int,
    scope_x: tuple[float, float] = (-1.0, 1.0),
    scope_v: tuple[float, float] = (-1.0, 1.0),
    iters: int = 100,
    w_max: float = 0.9,
    w_min: float = 0.4,
    c1: float = 2.0,
    c2: float = 2.0,
):
    """Global-best particle swarm, minimizing ``objective([dim]) -> scalar``
    (``EA.pso``, ``EA.py:76-127``): velocity update with linearly
    decaying inertia ``w(t) = w_max - t·(w_max-w_min)/T``
    (``EA.py:100-104``), cognitive/social constants c1/c2, positions and
    velocities clipped to their scopes (``EA.init_particle``,
    ``EA.py:39-52``).

    :returns: (best position ``[dim]``, best value)
    """
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(
        k1, (num_particles, dim), minval=scope_x[0], maxval=scope_x[1]
    )
    vel = jax.random.uniform(
        k2, (num_particles, dim), minval=scope_v[0], maxval=scope_v[1]
    )
    fitness = jax.vmap(objective)(pos)
    pbest, pbest_val = pos, fitness
    g_idx = jnp.argmin(fitness)
    gbest, gbest_val = pos[g_idx], fitness[g_idx]

    def step(carry, t):
        pos, vel, pbest, pbest_val, gbest, gbest_val, key = carry
        key, ka, kb = jax.random.split(key, 3)
        w = w_max - t * (w_max - w_min) / iters
        r1 = jax.random.uniform(ka, pos.shape)
        r2 = jax.random.uniform(kb, pos.shape)
        vel = (
            w * vel
            + c1 * r1 * (pbest - pos)
            + c2 * r2 * (gbest[None, :] - pos)
        )
        vel = jnp.clip(vel, scope_v[0], scope_v[1])
        pos = jnp.clip(pos + vel, scope_x[0], scope_x[1])
        fitness = jax.vmap(objective)(pos)
        improved = fitness < pbest_val
        pbest = jnp.where(improved[:, None], pos, pbest)
        pbest_val = jnp.where(improved, fitness, pbest_val)
        g_idx = jnp.argmin(pbest_val)
        better = pbest_val[g_idx] < gbest_val
        gbest = jnp.where(better, pbest[g_idx], gbest)
        gbest_val = jnp.where(better, pbest_val[g_idx], gbest_val)
        return (pos, vel, pbest, pbest_val, gbest, gbest_val, key), None

    carry = (pos, vel, pbest, pbest_val, gbest, gbest_val, k3)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(iters, dtype=jnp.float32))
    return carry[4], carry[5]


def p_som(key, x, num_neurons: int, pso_particles: int = 16,
          pso_iters: int = 50, **som_kwargs):
    """PSO-initialized SOM (``ANN.p_som``, ``ANN.py:100-130``): the swarm
    searches for initial neuron weights minimizing quantization error,
    then the SOM refines them."""
    n, d = x.shape
    lo = float(jnp.min(x))
    hi = float(jnp.max(x))

    def objective(flat):
        return quantization_error(flat.reshape(num_neurons, d), x)

    k1, k2 = jax.random.split(key)
    best, _ = pso(
        k1, objective, pso_particles, num_neurons * d,
        scope_x=(lo, hi), scope_v=(-(hi - lo) / 10.0, (hi - lo) / 10.0),
        iters=pso_iters,
    )
    return som(k2, x, num_neurons, weights0=best.reshape(num_neurons, d),
               **som_kwargs)
