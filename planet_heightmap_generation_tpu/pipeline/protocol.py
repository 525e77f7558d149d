"""Worker message protocol — command dispatch with structured errors.

The reference's worker wraps every command in try/catch and answers with
``{type:'error', message, stack}`` on failure, or a typed done message on
success (js/planet-worker.js:136-339, 336-338, 944-954). This module is
that protocol surface for embedders: 5 request commands in, 6 response
types out (progress / done / reapplyDone / editDone / climateDone / error),
all plain dicts — no exception ever escapes ``dispatch``.
"""

from __future__ import annotations

import traceback
from typing import Callable, Dict, Optional

import numpy as np

from ..config import GenerationParams
from .engine import PlanetEngine, PlanetResult

COMMANDS = ("generate", "reapply", "editRecompute", "computeClimate",
            "importHeightmap")
RESPONSES = ("progress", "done", "reapplyDone", "editDone", "climateDone",
             "error")


def _result_payload(result: PlanetResult) -> Dict:
    """The 'done' payload: per-cell arrays trimmed to real cells — the
    transferable-buffer equivalent (js/planet-worker.js:299-334)."""
    n = result.graph.n_cells
    out = dict(
        elevation=np.asarray(result.elevation)[:n],
        pre_post_elevation=np.asarray(result.pre_post_elevation)[:n],
        r_plate=np.asarray(result.r_plate)[:n],
        stress=np.asarray(result.stress)[:n],
        plate_is_ocean=np.asarray(result.plate_is_ocean),
        t_elevation=np.asarray(result.t_elevation),
        triangles=result.graph.triangles,
        diagnostics=result.diagnostics(),
        timing=[(name, ms) for name, ms in result.timing.stages],
    )
    if result.climate is not None:
        cl = result.climate
        out["koppen"] = np.asarray(cl["koppen"])[:n]
        for s in ("summer", "winter"):
            out[f"temperature_{s}"] = np.asarray(
                cl["temp"][f"r_temperature_{s}"])[:n]
            out[f"precip_{s}"] = np.asarray(
                cl["precip"][f"r_precip_{s}"])[:n]
    if result.error is not None:
        # degraded result: terrain arrays are valid, a later stage failed —
        # the reference's partial-result healing surface
        # (js/generate.js:246-308); retry climate via computeClimate
        out["error"] = dict(result.error)
    return out


class WorkerProtocol:
    """Stateful dispatcher mirroring the reference worker's retained-state
    command loop. ``on_message(response_dict)`` receives every response,
    including progress events."""

    def __init__(self, engine: Optional[PlanetEngine] = None,
                 on_message: Optional[Callable[[Dict], None]] = None):
        self.engine = engine or PlanetEngine()
        self._emit = on_message or (lambda msg: None)

    def dispatch(self, msg: Dict) -> Dict:
        """Handle one request dict ``{"cmd": ..., **payload}``; returns (and
        emits) the response dict. Errors come back as
        ``{"type": "error", "cmd", "message", "stack"}`` — never raised."""
        cmd = msg.get("cmd")
        try:
            if cmd not in COMMANDS:
                raise ValueError(
                    f"unknown command {cmd!r}; expected one of {COMMANDS}")
            handler = getattr(self, "_" + cmd)
            resp = handler(msg)
        except Exception as e:  # noqa: BLE001 — protocol boundary
            resp = dict(type="error", cmd=cmd, message=str(e),
                        stack=traceback.format_exc())
        self._emit(resp)
        return resp

    # ── command handlers ─────────────────────────────────────────────
    def _progress_cb(self):
        def cb(pct, label):
            self._emit(dict(type="progress", pct=float(pct),
                            label=str(label)))
        return cb

    def _generate(self, msg):
        params = msg.get("params")
        if not isinstance(params, GenerationParams):
            params = GenerationParams(**(params or {}))
        result = self.engine.generate(params, on_progress=self._progress_cb())
        return dict(type="done", **_result_payload(result))

    def _reapply(self, msg):
        result = self.engine.reapply(
            sculpt=msg.get("sculpt"),
            skip_climate=bool(msg.get("skipClimate", False)),
            on_progress=self._progress_cb())
        return dict(type="reapplyDone", **_result_payload(result))

    def _editRecompute(self, msg):  # noqa: N802 — protocol name
        result = self.engine.edit_recompute(
            tuple(msg.get("toggledIndices", ())),
            skip_climate=bool(msg.get("skipClimate", False)),
            on_progress=self._progress_cb())
        return dict(type="editDone", **_result_payload(result))

    def _computeClimate(self, msg):  # noqa: N802
        cl = self.engine.compute_climate(
            temperature_offset=msg.get("temperatureOffset"),
            precipitation_offset=msg.get("precipitationOffset"),
            on_progress=self._progress_cb())
        n = self.engine._w["graph"].n_cells
        out = dict(type="climateDone",
                   koppen=np.asarray(cl["koppen"])[:n])
        for s in ("summer", "winter"):
            out[f"temperature_{s}"] = np.asarray(
                cl["temp"][f"r_temperature_{s}"])[:n]
            out[f"precip_{s}"] = np.asarray(
                cl["precip"][f"r_precip_{s}"])[:n]
        return out

    def _importHeightmap(self, msg):  # noqa: N802
        params = msg.get("params")
        if not isinstance(params, GenerationParams):
            params = GenerationParams(**(params or {}))
        gray = np.asarray(msg["grayscale"], np.float32)
        result = self.engine.import_heightmap(
            gray.ravel(), int(msg["width"]), int(msg["height"]), params,
            on_progress=self._progress_cb())
        return dict(type="done", **_result_payload(result))
