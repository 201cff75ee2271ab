"""Shared scaffolding for the example scripts.

The reference ships its examples as notebooks (``/root/reference/examples/
*.ipynb``); here they are runnable scripts. Every script supports:

``--full``     notebook-scale problem sizes (defaults are CPU-quick),
``--plot``     save figures as PNG next to the script,
``--seed N``   RNG seed.
"""

from __future__ import annotations

import argparse
import os
import time


def example_args(description, extra=None):
    """Parse the standard example CLI and enable the compilation cache."""
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--full", action="store_true",
                        help="notebook-scale sizes (slow on CPU)")
    parser.add_argument("--plot", action="store_true",
                        help="save figures as PNG")
    parser.add_argument("--seed", type=int, default=0)
    if extra is not None:
        extra(parser)
    args = parser.parse_args()

    # Persistent XLA compilation cache (shared with the test suites):
    # example reruns skip recompiles, which dominate quick-scale runtime.
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return args


def maybe_save_plot(args, name):
    """Save the current matplotlib figure if ``--plot`` was given."""
    if not args.plot:
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       name + ".png")
    plt.gcf().savefig(out, dpi=120, bbox_inches="tight")
    plt.close("all")
    print("saved", out)


class Timer:
    """Context manager printing a labelled wall-clock duration."""

    def __init__(self, label):
        self.label = label

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        print("{}: {:.2f}s".format(self.label,
                                   time.perf_counter() - self.start))


def make_actor_critic_scan(policy, value_function, dynamics,
                           reward_function, gamma, r_max, state_dim,
                           value_iters, policy_iters, joint_iters,
                           batch=100, value_lr=0.005, policy_lr=4.0):
    """Jitted joint actor-critic training as ONE compiled program.

    Returns ``scan(pol_params, vf_params, key) -> (pol_params,
    vf_params)`` running ``joint_iters x (value_iters TD steps +
    policy_iters ascent steps)`` with on-device minibatch sampling and
    global-norm gradient clipping — the shared harness of the
    reinforcement-learning examples (the reference notebooks pay one
    ``session.run`` per step)."""
    import jax
    import jax.numpy as jnp

    def _sample(k):
        return jax.random.uniform(k, (batch, state_dim), minval=-1.0,
                                  maxval=1.0)

    def _clip(tree, max_norm=1.0):
        norm = jnp.sqrt(sum(jnp.sum(x ** 2)
                            for x in jax.tree_util.tree_leaves(tree)))
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-12))
        return jax.tree_util.tree_map(lambda x: x * scale, tree)

    def value_step(vf, pol, states):
        actions = policy.with_parameters(pol)(states)
        rewards = reward_function(states, actions)
        future = dynamics(states, actions)

        def loss(p):
            v = value_function.with_parameters(p)
            target = jax.lax.stop_gradient(rewards + gamma * v(future))
            return jnp.mean(jnp.abs(v(states) - target)) / r_max

        return jax.tree_util.tree_map(
            lambda w, grad: w - value_lr * grad, vf,
            _clip(jax.grad(loss)(vf)))

    def policy_step(pol, vf, states):
        v = value_function.with_parameters(vf)

        def loss(p):
            actions = policy.with_parameters(p)(states)
            rewards = reward_function(states, actions)
            future = dynamics(states, actions)
            return -(1 - gamma) / r_max * jnp.mean(rewards
                                                   + gamma * v(future))

        return jax.tree_util.tree_map(
            lambda w, grad: w - policy_lr * grad, pol,
            _clip(jax.grad(loss)(pol)))

    @jax.jit
    def scan(pol, vf, key):
        def value_body(carry, _):
            vf, pol, k = carry
            k, kb = jax.random.split(k)
            return (value_step(vf, pol, _sample(kb)), pol, k), None

        def policy_body(carry, _):
            pol, vf, k = carry
            k, kb = jax.random.split(k)
            return (policy_step(pol, vf, _sample(kb)), vf, k), None

        def joint_body(carry, _):
            pol, vf, k = carry
            (vf, pol, k), _ = jax.lax.scan(value_body, (vf, pol, k),
                                           None, length=value_iters)
            (pol, vf, k), _ = jax.lax.scan(policy_body, (pol, vf, k),
                                           None, length=policy_iters)
            return (pol, vf, k), None

        (pol, vf, _), _ = jax.lax.scan(joint_body, (pol, vf, key), None,
                                       length=joint_iters)
        return pol, vf

    return scan
