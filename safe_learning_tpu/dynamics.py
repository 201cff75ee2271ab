"""Benchmark dynamical systems: inverted pendulum, cart-pole, Van der Pol.

TPU-native equivalents of the reference's example dynamics
(``/root/reference/examples/utilities.py:144-519``): pure ``jnp`` ODEs with
fixed-step inner Euler integration (vectorized over arbitrarily many states,
so a whole grid integrates in one fused program), optional state/action
normalization, and exact ZOH linearization computed from the analytic
Jacobian via the matrix exponential.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from .config import config
from .functions.base import DeterministicFunction, register_pytree

__all__ = ["InvertedPendulum", "CartPole", "VanDerPol", "GRAVITY"]

GRAVITY = 9.81


class _OdeDynamics(DeterministicFunction):
    """Shared scaffolding: normalization + inner-Euler integration."""

    inner_euler_steps = 10

    def _norm_arrays(self):
        raise NotImplementedError

    def normalize(self, state, action=None):
        """Physical -> normalized coordinates."""
        norm = self._norm_arrays()
        if norm is None:
            return state, action
        tx, tu = norm
        state = state / tx
        if action is not None and tu is not None:
            action = action / tu
        return state, action

    def denormalize(self, state, action=None):
        """Normalized -> physical coordinates."""
        norm = self._norm_arrays()
        if norm is None:
            return state, action
        tx, tu = norm
        state = state * tx
        if action is not None and tu is not None:
            action = action * tu
        return state, action

    def evaluate(self, points):
        state = points[:, :self.state_dim]
        action = points[:, self.state_dim:]
        state, action = self.denormalize(state, action)
        dt = self.dt / self.inner_euler_steps
        for _ in range(self.inner_euler_steps):
            state = state + dt * self.ode(state, action)
        return self.normalize(state)[0]

    def linearize(self):
        """Discrete-time ZOH linearization around the origin.

        The EXACT Jacobian of :meth:`ode`, derived with
        ``jax.jacobian`` + ``scipy.signal.cont2discrete``, replacing the
        reference's hand-written matrices
        (``examples/utilities.py:207-240``). For the pendulum the two
        coincide; for the cart-pole the reference's hand-written ``A``
        is inconsistent with its own ODE (its v-dot row differs by a
        factor of the pole length) — autodiff is self-consistent with
        the dynamics actually simulated, which is what a certificate
        must linearize.
        """
        x0 = jnp.zeros((1, self.state_dim), dtype=config.dtype)
        u0 = jnp.zeros((1, self.action_dim), dtype=config.dtype)

        def ode_flat(x, u):
            return self.ode(x[None, :], u[None, :])[0]

        a = np.asarray(jax.jacobian(ode_flat, argnums=0)(x0[0], u0[0]))
        b = np.asarray(jax.jacobian(ode_flat, argnums=1)(x0[0], u0[0]))
        if b.size == 0:
            b = np.zeros((self.state_dim, max(self.action_dim, 1)))

        norm = self._norm_arrays()
        if norm is not None:
            tx, tu = norm
            tx = np.asarray(tx)
            a = np.diag(1.0 / tx) @ a @ np.diag(tx)
            if tu is not None and self.action_dim:
                b = np.diag(1.0 / tx) @ b @ np.diag(np.asarray(tu))

        ad, bd, _, _, _ = scipy.signal.cont2discrete(
            (a, b, np.zeros((1, self.state_dim)), 0), self.dt, method="zoh")
        if self.action_dim:
            return (ad.astype(config.np_dtype),
                    bd[:, :self.action_dim].astype(config.np_dtype))
        return ad.astype(config.np_dtype)

    def ode(self, state, action):
        raise NotImplementedError


@register_pytree
class InvertedPendulum(_OdeDynamics):
    """Nonlinear inverted pendulum (``examples/utilities.py:144-289``).

    State ``(angle, angular velocity)``, action = torque. With
    ``normalization=(Tx, Tu)`` the dynamics operate on normalized
    coordinates ``x = diag(Tx) x_norm``.
    """

    _data_fields = ("mass", "length", "friction", "tx", "tu")
    _meta_fields = ("dt", "state_dim", "action_dim", "has_norm")

    state_dim = 2
    action_dim = 1
    input_dim = 3
    output_dim = 2

    def __init__(self, mass, length, friction=0.0, dt=1 / 80,
                 normalization=None):
        self.mass = jnp.asarray(mass, dtype=config.dtype)
        self.length = jnp.asarray(length, dtype=config.dtype)
        self.friction = jnp.asarray(friction, dtype=config.dtype)
        self.dt = float(dt)
        self.has_norm = normalization is not None
        if self.has_norm:
            tx, tu = normalization
            self.tx = jnp.asarray(tx, dtype=config.dtype).ravel()
            self.tu = jnp.asarray(tu, dtype=config.dtype).ravel()
        else:
            self.tx = None
            self.tu = None

    @property
    def inertia(self):
        """Total pendulum inertia about the pivot."""
        return self.mass * self.length ** 2

    def _norm_arrays(self):
        if not self.has_norm:
            return None
        return self.tx, self.tu

    def ode(self, state, action):
        """Continuous-time dynamics ``dx/dt`` at ``(state, action)``."""
        angle = state[:, :1]
        angular_velocity = state[:, 1:]
        accel = (GRAVITY / self.length * jnp.sin(angle)
                 + action / self.inertia
                 - self.friction / self.inertia * angular_velocity)
        return jnp.concatenate((angular_velocity, accel), axis=1)


@register_pytree
class CartPole(_OdeDynamics):
    """Cart-mounted inverted pendulum (``examples/utilities.py:292-437``).

    State ``(x, theta, v, omega)``, action = horizontal force on the cart.
    """

    _data_fields = ("pendulum_mass", "cart_mass", "length", "rot_friction",
                    "tx", "tu")
    _meta_fields = ("dt", "state_dim", "action_dim", "has_norm")

    state_dim = 4
    action_dim = 1
    input_dim = 5
    output_dim = 4

    def __init__(self, pendulum_mass, cart_mass, length, rot_friction=0.0,
                 dt=0.01, normalization=None):
        self.pendulum_mass = jnp.asarray(pendulum_mass, dtype=config.dtype)
        self.cart_mass = jnp.asarray(cart_mass, dtype=config.dtype)
        self.length = jnp.asarray(length, dtype=config.dtype)
        self.rot_friction = jnp.asarray(rot_friction, dtype=config.dtype)
        self.dt = float(dt)
        self.has_norm = normalization is not None
        if self.has_norm:
            tx, tu = normalization
            self.tx = jnp.asarray(tx, dtype=config.dtype).ravel()
            self.tu = jnp.asarray(tu, dtype=config.dtype).ravel()
        else:
            self.tx = None
            self.tu = None

    def _norm_arrays(self):
        if not self.has_norm:
            return None
        return self.tx, self.tu

    def ode(self, state, action):
        """Continuous-time dynamics ``dx/dt`` at ``(state, action)``."""
        m = self.pendulum_mass
        big_m = self.cart_mass
        length = self.length
        b = self.rot_friction
        g = GRAVITY

        theta = state[:, 1:2]
        v = state[:, 2:3]
        omega = state[:, 3:4]

        sin_t = jnp.sin(theta)
        cos_t = jnp.cos(theta)
        sin_2t = jnp.sin(2 * theta)
        det = length * (big_m + m * sin_t ** 2)
        v_dot = ((action - m * length * omega ** 2 * sin_t
                  - b * omega * cos_t
                  + 0.5 * m * g * length * sin_2t) * length / det)
        omega_dot = ((action * cos_t
                      - 0.5 * m * length * omega ** 2 * sin_2t
                      - b * (m + big_m) * omega / (m * length)
                      + (m + big_m) * g * sin_t) / det)
        return jnp.concatenate((v, omega, v_dot, omega_dot), axis=1)


@register_pytree
class VanDerPol(_OdeDynamics):
    """Van der Pol oscillator in reverse time, uncontrolled benchmark.

    (reference ``examples/utilities.py:440-519``)."""

    _data_fields = ("damping", "tx")
    _meta_fields = ("dt", "state_dim", "action_dim", "has_norm")

    state_dim = 2
    action_dim = 0
    input_dim = 2
    output_dim = 2

    def __init__(self, damping=1.0, dt=0.01, normalization=None):
        self.damping = jnp.asarray(damping, dtype=config.dtype)
        self.dt = float(dt)
        self.has_norm = normalization is not None
        self.tx = (jnp.asarray(normalization, dtype=config.dtype).ravel()
                   if self.has_norm else None)

    def _norm_arrays(self):
        if not self.has_norm:
            return None
        return self.tx, None

    def ode(self, state, action):
        """Continuous-time dynamics ``dx/dt`` at ``(state, action)``."""
        del action  # uncontrolled system
        x = state[:, :1]
        y = state[:, 1:]
        x_dot = -y
        y_dot = x + self.damping * (x ** 2 - 1) * y
        return jnp.concatenate((x_dot, y_dot), axis=1)
