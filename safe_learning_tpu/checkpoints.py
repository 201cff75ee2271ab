"""Checkpoint / resume for safe-learning state.

The reference has no library-level checkpointing; its notebooks snapshot
Lyapunov-network variables with raw ``tf.train.Saver``
(``lyapunov_function_learning.ipynb``, SURVEY.md section 5). Here the whole
learning state — function parameters, GP data buffers, safe set, certified
level — is a pytree saved with orbax (falling back to a plain ``npz`` when
orbax is unavailable).
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "lyapunov_state",
           "restore_lyapunov_state", "policy_iteration_state",
           "restore_policy_iteration_state"]


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    entries = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        entries[key] = np.asarray(leaf)
    return entries, treedef


def save_checkpoint(path, state, use_orbax=False):
    """Save a pytree checkpoint.

    Parameters
    ----------
    path : str
        Target path (``.npz`` appended for the default format).
    state : pytree
        Arbitrary pytree of arrays/scalars.
    use_orbax : bool, optional
        Use orbax's StandardCheckpointer (directory format) instead of the
        self-contained ``npz`` file.
    """
    if use_orbax:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path, state, force=True)
        checkpointer.wait_until_finished()
        return path
    entries, _ = _flatten_with_paths(state)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, **entries)
    return path


def restore_checkpoint(path, target):
    """Restore a pytree checkpoint into the structure of ``target``.

    When BOTH an ``npz`` file and an orbax directory exist for ``path``,
    the newer one wins (with a warning) — a run that switched formats
    must never silently resume from the stale snapshot."""
    use_npz = path.endswith(".npz") or os.path.exists(path + ".npz")
    if (not path.endswith(".npz") and os.path.exists(path + ".npz")
            and os.path.isdir(path)):
        import warnings

        # A directory's own mtime only changes when DIRECT entries are
        # added/removed (orbax overwrites files inside step
        # subdirectories), so take the newest mtime found anywhere
        # inside the orbax tree.
        orbax_mtime = os.path.getmtime(path)
        for root, _dirs, files in os.walk(path):
            for name in files:
                orbax_mtime = max(orbax_mtime, os.path.getmtime(
                    os.path.join(root, name)))
        newer_orbax = orbax_mtime > os.path.getmtime(path + ".npz")
        warnings.warn(
            "both an orbax directory and an npz file exist at {!r}; "
            "restoring the newer {} checkpoint".format(
                path, "orbax" if newer_orbax else "npz"))
        use_npz = not newer_orbax
    if use_npz:
        if not path.endswith(".npz"):
            path = path + ".npz"
        data = np.load(path)
        entries, treedef = _flatten_with_paths(target)
        leaves = [data[key] for key in entries]
        return jax.tree_util.tree_unflatten(treedef, leaves)
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(os.path.abspath(path), target=target)


def _gp_state(gp):
    """Full persistent state of one GP: data buffers AND hyperparameters.

    The kernel is a pytree of arrays (lengthscales, variances, nested
    kernels), so it flattens into the checkpoint like any other leaf
    group; restoring onto a GP constructed with different hyperparameters
    reproduces the saved posterior exactly.
    """
    return {
        "X_buf": np.asarray(gp.X_buf),
        "Y_buf": np.asarray(gp.Y_buf),
        "count": np.asarray(gp.count),
        "kernel": gp.kernel,
        "noise_variance": np.asarray(gp.noise_variance),
        "beta": np.asarray(gp.beta),
        "scale": np.asarray(gp.scale),
    }


def _restore_gp(gp, state):
    """Rebuild a GP from saved state and refresh the Cholesky cache."""
    import jax.numpy as jnp

    from .functions.gp import _gp_cache

    new = gp.replace(
        X_buf=jnp.asarray(state["X_buf"]),
        Y_buf=jnp.asarray(state["Y_buf"]),
        count=jnp.asarray(state["count"]),
        kernel=state.get("kernel", gp.kernel),
        noise_variance=jnp.asarray(state.get("noise_variance",
                                             gp.noise_variance)),
        beta=float(state.get("beta", gp.beta)),
        scale=float(state.get("scale", gp.scale)))
    chol, chol_inv, alpha = _gp_cache(new)
    return new.replace(chol=chol, chol_inv=chol_inv, alpha=alpha)


def _stacked_gp_state(gp):
    """Full persistent state of a :class:`StackedGaussianProcess`."""
    return {
        "X_buf": np.asarray(gp.X_buf),
        "Y_buf": np.asarray(gp.Y_buf),
        "count": np.asarray(gp.count),
        "kernels": list(gp.kernels),
        "noise_variances": np.asarray(gp.noise_variances),
        "betas": np.asarray(gp.betas),
        "scale": np.asarray(gp.scale),
    }


def _restore_stacked_gp(gp, state):
    """Rebuild a stacked GP from saved state and refresh the caches."""
    import jax.numpy as jnp

    from .functions.gp import _stacked_cache

    new = gp.replace(
        X_buf=jnp.asarray(state["X_buf"]),
        Y_buf=jnp.asarray(state["Y_buf"]),
        count=jnp.asarray(state["count"]),
        kernels=tuple(state.get("kernels", gp.kernels)),
        noise_variances=jnp.asarray(state.get("noise_variances",
                                              gp.noise_variances)),
        betas=tuple(float(b) for b in
                    np.asarray(state.get("betas", gp.betas))),
        scale=float(state.get("scale", gp.scale)))
    chol, chol_inv, alpha = _stacked_cache(new)
    return new.replace(chol=chol, chol_inv=chol_inv, alpha=alpha)


def lyapunov_state(lyapunov):
    """Extract the persistent state of a :class:`Lyapunov` object."""
    from .functions.gp import StackedGaussianProcess

    state = {
        "safe_set": np.asarray(lyapunov.safe_set),
        "c_max": np.asarray(lyapunov.c_max),
        "values": np.asarray(lyapunov.values),
        "refinement": np.asarray(lyapunov._refinement),
        "lyapunov_parameters": lyapunov.lyapunov_function.parameters_dict,
        "policy_parameters": lyapunov.policy.parameters_dict,
    }
    # The Lipschitz specs are often parameterized Functions wrapping the
    # same nets (e.g. GradientNorm(net)); persist their parameters too,
    # or a restore would silently compute thresholds from the
    # pre-restore gradients (an unsound certificate).
    from .functions.base import Function as _Function

    for name, attr in (("lipschitz_lyapunov_parameters",
                        "_lipschitz_lyapunov"),
                       ("lipschitz_dynamics_parameters",
                        "_lipschitz_dynamics")):
        fun = getattr(lyapunov, attr)
        if isinstance(fun, _Function) and fun.parameters_dict:
            state[name] = fun.parameters_dict
    dynamics = lyapunov.dynamics
    if isinstance(dynamics, StackedGaussianProcess):
        state["gp_stacked"] = _stacked_gp_state(dynamics)
    elif hasattr(dynamics, "X_buf"):
        state["gp"] = _gp_state(dynamics)
    elif hasattr(dynamics, "functions") and all(
            hasattr(f, "X_buf") for f in dynamics.functions):
        state["gp_stack"] = [_gp_state(f) for f in dynamics.functions]
    return state


def policy_iteration_state(rl):
    """Extract the persistent state of a :class:`PolicyIteration` object:

    policy and value-function parameters, plus full GP dynamics state
    when the dynamics are (stacked) GPs."""
    from .functions.gp import GaussianProcess, StackedGaussianProcess

    state = {
        "policy_parameters": rl.policy.parameters_dict,
        "value_parameters": rl.value_function.parameters_dict,
    }
    if isinstance(rl.dynamics, StackedGaussianProcess):
        state["gp_stacked"] = _stacked_gp_state(rl.dynamics)
    elif isinstance(rl.dynamics, GaussianProcess):
        state["gp"] = _gp_state(rl.dynamics)
    return state


def restore_policy_iteration_state(rl, state):
    """Write a saved state back onto a :class:`PolicyIteration` object."""
    if state.get("policy_parameters"):
        rl.policy = rl.policy.with_parameters(state["policy_parameters"])
    if state.get("value_parameters"):
        rl.value_function = rl.value_function.with_parameters(
            state["value_parameters"])
    if "gp_stacked" in state and hasattr(rl.dynamics, "kernels"):
        rl.dynamics = _restore_stacked_gp(rl.dynamics, state["gp_stacked"])
    elif "gp" in state and hasattr(rl.dynamics, "X_buf"):
        rl.dynamics = _restore_gp(rl.dynamics, state["gp"])
    return rl


def restore_lyapunov_state(lyapunov, state):
    """Write a saved state back onto a :class:`Lyapunov` object.

    Functional components are replaced, host state assigned."""
    lyapunov.safe_set = np.asarray(state["safe_set"]).astype(bool)
    lyapunov.c_max = float(state["c_max"])
    lyapunov.values = np.asarray(state["values"])
    lyapunov._refinement = np.asarray(state["refinement"]).astype(int)
    if state.get("lyapunov_parameters"):
        lyapunov.lyapunov_function = \
            lyapunov.lyapunov_function.with_parameters(
                state["lyapunov_parameters"])
    if state.get("policy_parameters"):
        lyapunov.policy = lyapunov.policy.with_parameters(
            state["policy_parameters"])
    from .functions.base import Function as _Function

    for name, attr in (("lipschitz_lyapunov_parameters",
                        "_lipschitz_lyapunov"),
                       ("lipschitz_dynamics_parameters",
                        "_lipschitz_dynamics")):
        fun = getattr(lyapunov, attr)
        if state.get(name) and isinstance(fun, _Function):
            setattr(lyapunov, attr, fun.with_parameters(state[name]))
    if "gp_stacked" in state and hasattr(lyapunov.dynamics, "kernels"):
        lyapunov.dynamics = _restore_stacked_gp(lyapunov.dynamics,
                                                state["gp_stacked"])
    elif "gp" in state and hasattr(lyapunov.dynamics, "X_buf"):
        lyapunov.dynamics = _restore_gp(lyapunov.dynamics, state["gp"])
    elif "gp_stack" in state and hasattr(lyapunov.dynamics, "functions"):
        restored = [_restore_gp(f, s) for f, s in
                    zip(lyapunov.dynamics.functions, state["gp_stack"])]
        lyapunov.dynamics = lyapunov.dynamics.replace(
            functions=tuple(restored))
    return lyapunov
