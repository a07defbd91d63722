"""ctypes bindings for the native host runtime (runtime/irrl_runtime.cpp).

Auto-builds the shared library on first use if a toolchain is present and
falls back to numpy implementations otherwise, so the package works in
pure-Python environments. API:

    load_table(path)           -> (rows, cols) float32 ndarray
    resample(table, dt_in, n_out, dt_out) -> float32 ndarray
    TelemetryRing(capacity, record_size)  -> lock-free push/pop ring
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libirrl_runtime.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.path.exists(os.path.join(_RUNTIME_DIR, "Makefile")):
        try:  # no-op when the .so is current; rebuilds after source edits
            subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pass
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.irrl_table_load.restype = ctypes.c_long
    lib.irrl_table_load.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                    ctypes.c_long, ctypes.POINTER(ctypes.c_long),
                                    ctypes.POINTER(ctypes.c_long)]
    lib.irrl_resample.restype = None
    lib.irrl_resample.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                                  ctypes.c_double, ctypes.c_void_p,
                                  ctypes.c_long, ctypes.c_double]
    lib.irrl_ring_create.restype = ctypes.c_void_p
    lib.irrl_ring_create.argtypes = [ctypes.c_long, ctypes.c_long]
    lib.irrl_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.irrl_ring_push.restype = ctypes.c_int
    lib.irrl_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.irrl_ring_pop.restype = ctypes.c_long
    lib.irrl_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
    lib.irrl_ring_dropped.restype = ctypes.c_long
    lib.irrl_ring_dropped.argtypes = [ctypes.c_void_p]
    lib.irrl_server_create.restype = ctypes.c_void_p
    lib.irrl_server_create.argtypes = [ctypes.c_int]
    lib.irrl_server_port.restype = ctypes.c_int
    lib.irrl_server_port.argtypes = [ctypes.c_void_p]
    lib.irrl_server_clients.restype = ctypes.c_long
    lib.irrl_server_clients.argtypes = [ctypes.c_void_p]
    lib.irrl_server_update.restype = None
    lib.irrl_server_update.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_long]
    lib.irrl_server_destroy.restype = None
    lib.irrl_server_destroy.argtypes = [ctypes.c_void_p]
    lib.irrl_policy_create.restype = ctypes.c_void_p
    lib.irrl_policy_create.argtypes = [ctypes.c_char_p]
    lib.irrl_policy_obs_dim.restype = ctypes.c_int
    lib.irrl_policy_obs_dim.argtypes = [ctypes.c_void_p]
    lib.irrl_policy_act_dim.restype = ctypes.c_int
    lib.irrl_policy_act_dim.argtypes = [ctypes.c_void_p]
    lib.irrl_policy_reset.restype = None
    lib.irrl_policy_reset.argtypes = [ctypes.c_void_p]
    lib.irrl_policy_state.restype = ctypes.c_long
    lib.irrl_policy_state.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.irrl_policy_act.restype = None
    lib.irrl_policy_act.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p]
    lib.irrl_policy_destroy.restype = None
    lib.irrl_policy_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def load_table(path: str) -> np.ndarray:
    """Fast numeric-table load (CSV / whitespace / semicolon separated)."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path, delimiter=None if _sniff_ws(path) else ",",
                          dtype=np.float32, ndmin=2)
    rows, cols = ctypes.c_long(), ctypes.c_long()
    n = lib.irrl_table_load(path.encode(), None, 0,
                            ctypes.byref(rows), ctypes.byref(cols))
    if n < 0:
        raise IOError(f"irrl_table_load failed ({n}) for {path}")
    out = np.empty(n, dtype=np.float32)
    lib.irrl_table_load(path.encode(), out.ctypes.data_as(ctypes.c_void_p), n,
                        ctypes.byref(rows), ctypes.byref(cols))
    return out.reshape(rows.value, cols.value)


def _sniff_ws(path: str) -> bool:
    with open(path) as f:
        line = f.readline()
    return "," not in line


def resample(table: np.ndarray, dt_in: float, n_out: int, dt_out: float) -> np.ndarray:
    """Linear time-resampling of an (n, cols) trajectory table."""
    table = np.ascontiguousarray(table, dtype=np.float32)
    lib = _load()
    if lib is None:
        t = np.arange(n_out) * dt_out / dt_in
        i0 = np.clip(t.astype(np.int64), 0, table.shape[0] - 2)
        a = np.clip(t - i0, 0.0, 1.0)[:, None]
        return ((1 - a) * table[i0] + a * table[i0 + 1]).astype(np.float32)
    out = np.empty((n_out, table.shape[1]), dtype=np.float32)
    lib.irrl_resample(table.ctypes.data_as(ctypes.c_void_p), table.shape[0],
                      table.shape[1], dt_in,
                      out.ctypes.data_as(ctypes.c_void_p), n_out, dt_out)
    return out


class TelemetryRing:
    """Lock-free SPSC ring of fixed-size float records (native when built)."""

    def __init__(self, capacity: int, record_size: int):
        self.record_size = record_size
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.irrl_ring_create(capacity, record_size)
            self._fallback = None
        else:
            self._h = None
            self._fallback = []
            self._cap = capacity
            self._dropped = 0

    def push(self, rec: np.ndarray) -> bool:
        rec = np.ascontiguousarray(rec, dtype=np.float32)
        if self._h is not None:
            return bool(self._lib.irrl_ring_push(
                self._h, rec.ctypes.data_as(ctypes.c_void_p)))
        if len(self._fallback) >= self._cap:
            self._dropped += 1
            return False
        self._fallback.append(rec.copy())
        return True

    def pop(self, max_records: int = 1 << 16) -> np.ndarray:
        if self._h is not None:
            out = np.empty((max_records, self.record_size), dtype=np.float32)
            n = self._lib.irrl_ring_pop(
                self._h, out.ctypes.data_as(ctypes.c_void_p), max_records)
            return out[:n]
        out = np.array(self._fallback[:max_records], dtype=np.float32).reshape(
            -1, self.record_size)
        del self._fallback[:max_records]
        return out

    @property
    def dropped(self) -> int:
        if self._h is not None:
            return int(self._lib.irrl_ring_dropped(self._h))
        return self._dropped

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.irrl_ring_destroy(self._h)
            self._h = None


class StateServer:
    """Native TCP state-streaming server — the RaisimServer twin
    (RaisimServer.hpp:53-470). Publish with update(state); remote viewers
    poll with StateClient. Requires the native runtime (raises otherwise)."""

    def __init__(self, port: int = 0):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native runtime not built; StateServer needs it")
        self._h = self._lib.irrl_server_create(port)
        if not self._h:
            raise OSError(f"could not bind state server on port {port}")

    @property
    def port(self) -> int:
        return int(self._lib.irrl_server_port(self._h))

    @property
    def clients(self) -> int:
        return int(self._lib.irrl_server_clients(self._h))

    def update(self, state: np.ndarray) -> None:
        state = np.ascontiguousarray(state, dtype=np.float32).ravel()
        self._lib.irrl_server_update(
            self._h, state.ctypes.data_as(ctypes.c_void_p), state.size)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.irrl_server_destroy(self._h)
            self._h = None

    def __del__(self):
        self.close()


class StateClient:
    """Deserializer twin (visualizer/deserializer.hpp:40-341): connects to a
    StateServer and polls state snapshots."""

    def __init__(self, port: int, host: str = "127.0.0.1", timeout: float = 5.0):
        import socket
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("state server closed the connection")
            buf += chunk
        return buf

    def meta(self) -> int:
        """Snapshot length in floats (REQUEST_META)."""
        self._sock.sendall(b"\x02")
        return int(np.frombuffer(self._recv_exact(4), dtype=np.uint32)[0])

    def state(self) -> tuple[int, np.ndarray]:
        """(sequence number, latest snapshot) via REQUEST_STATE."""
        self._sock.sendall(b"\x01")
        seq = int(np.frombuffer(self._recv_exact(4), dtype=np.uint32)[0])
        n = int(np.frombuffer(self._recv_exact(4), dtype=np.uint32)[0])
        data = np.frombuffer(self._recv_exact(4 * n), dtype=np.float32).copy()
        return seq, data

    def close(self) -> None:
        if getattr(self, "_sock", None):
            self._sock.close()
            self._sock = None


class NativePolicy:
    """Robot-side deployment runtime: the native C twin of the reference's
    NumPy onboard controller (CustomerLstmNN.predict, CustomerLstmNN.py:96-134).
    Loads a bp5 CSV export and runs the stacked-LSTM actor at 500 Hz with no
    Python/JAX dependency in the control loop (the C side keeps the recurrent
    state). Verified bit-for-bit-level against models/lstm.deterministic_action
    in tests/test_native.py."""

    def __init__(self, model_dir: str):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable (no toolchain?)")
        self._h = self._lib.irrl_policy_create(
            os.fspath(model_dir).encode())
        if not self._h:
            raise IOError(f"failed to load bp5 CSV policy from {model_dir}")
        self.obs_dim = self._lib.irrl_policy_obs_dim(self._h)
        self.act_dim = self._lib.irrl_policy_act_dim(self._h)

    def reset(self) -> None:
        self._lib.irrl_policy_reset(self._h)

    def act(self, obs: np.ndarray) -> np.ndarray:
        """One control step: normalized obs -> action clipped to [-1, 1].
        Advances the internal LSTM state."""
        obs = np.ascontiguousarray(obs, dtype=np.float32)
        if obs.shape != (self.obs_dim,):
            raise ValueError(f"obs shape {obs.shape} != ({self.obs_dim},)")
        out = np.empty(self.act_dim, dtype=np.float32)
        self._lib.irrl_policy_act(self._h,
                                  obs.ctypes.data_as(ctypes.c_void_p),
                                  out.ctypes.data_as(ctypes.c_void_p))
        return out

    def state(self) -> np.ndarray:
        """Recurrent state snapshot, per-layer [c|h] packing (matches
        models/lstm.state_size layout)."""
        size = self._lib.irrl_policy_state(self._h, None)
        out = np.empty(size, dtype=np.float32)
        n = self._lib.irrl_policy_state(
            self._h, out.ctypes.data_as(ctypes.c_void_p))
        return out[:n]

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.irrl_policy_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
