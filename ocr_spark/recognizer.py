"""Pluggable OCR backend seam with executor-local model caching.

The reference builds its PaddleOCR engine *inside a child process per HTTP
request* (main.py:1203, 1233) — i.e. model weights are reloaded for every
image; that is its single biggest throughput defect.  Here the recognizer is
an executor-local lazy singleton: ``get_recognizer`` is called from inside
the ``mapInPandas`` function, so the model loads once per executor Python
worker process and is reused across all Arrow batches
(``spark.python.worker.reuse=true`` keeps the worker alive across tasks).

Backends
--------
- ``fake``: deterministic sandbox backend.  "Images" are byte payloads
  produced by :mod:`ocr_spark.fixtures` that embed their own ground-truth
  line list; decoding is exact and reproducible.  This is what the golden
  span-sequence-equality tests run against (no cv2/paddle in the sandbox).
- ``paddle``: production backend — PaddleOCR with ``lang="es"`` and the
  orientation/unwarp stages disabled exactly like the reference
  (main.py:170-175).  Import-gated; raises a clear error when the libs are
  absent.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

FAKE_MAGIC = b"FAKEOCR1"

# Hard-kill fallback budget when a caller passes time_budget_s=None: far
# above any sane per-image inference time, but finite — the wrapper's
# whole purpose is to never block forever on a hung backend.
DEFAULT_HARD_BUDGET_S = 300.0


def decode_fake_payload(content: bytes) -> dict:
    """Decode a ``FAKEOCR1`` fixture payload to its dict — the ONE
    definition of the fake-payload format, shared by
    :class:`FakeRecognizer`, the multimodal metadata/frame path, and
    ``tools/gen_truth.py`` (previously three diverging copies).  Raises
    ``ValueError('decode_error')`` on ANY malformed payload: wrong
    magic, invalid JSON, or valid JSON that is not an object (a list or
    bare string used to escape as an AttributeError past the decode
    handler)."""
    data = bytes(content)
    if not data.startswith(FAKE_MAGIC):
        raise ValueError("decode_error")
    try:
        payload = json.loads(data[len(FAKE_MAGIC):].decode("utf-8"))
    except Exception:
        raise ValueError("decode_error") from None
    if not isinstance(payload, dict):
        raise ValueError("decode_error")
    return payload


@dataclass
class RecognizeResult:
    lines: list[str]
    error: str | None = None


class FakeRecognizer:
    """Deterministic recognizer: decodes fixture payloads back to their
    embedded ground-truth line lists.

    Payload format: ``FAKEOCR1`` magic + UTF-8 JSON
    ``{"lines": [...], "sleep_s": 0.0}``.  ``sleep_s`` lets tests exercise
    the in-UDF timeout budget; a wrong magic simulates an undecodable image
    (the reference's HTTP-400 path, main.py:1327-1328).

    ``work_iters_per_image`` burns a FIXED number of sha256 iterations per
    image (cache-resident, GIL-irrelevant across worker processes) to
    emulate real model-inference cost in scaling benchmarks.  Fixed
    iterations — not wall-clock calibration — so the amount of work is
    deterministic and identical at every parallelism level (calibrating
    under load would bias the comparison).  ~2000 iters ≈ 1 ms on this
    class of core.  0 (default) disables it.
    """

    name = "fake"

    def __init__(self, work_iters_per_image: int = 0) -> None:
        self.work_iters = int(work_iters_per_image)

    def _burn(self) -> None:
        import hashlib

        h = b"x" * 64
        for _ in range(self.work_iters):
            h = hashlib.sha256(h).digest()

    def recognize(self, content: bytes | None, time_budget_s: float | None = None) -> RecognizeResult:
        if self.work_iters:
            self._burn()
        if content is None or len(content) == 0:
            return RecognizeResult([], error="decode_error")
        try:
            payload = decode_fake_payload(content)
        except ValueError:
            return RecognizeResult([], error="decode_error")

        sleep_s = float(payload.get("sleep_s") or 0.0)
        if sleep_s:
            # Simulate a slow inference; the caller's budget check converts
            # overruns into quarantined rows (never a killed executor).
            # `is not None` — a 0.0 budget is a real budget, not absence.
            cap = time_budget_s if time_budget_s is not None else sleep_s
            time.sleep(min(sleep_s, cap + 0.05))

        lines = [str(x) for x in payload.get("lines") or []]
        return RecognizeResult(lines)


class PaddleRecognizer:
    """Production backend mirroring the reference engine configuration
    (main.py:159-175): Spanish model, doc-orientation / unwarping /
    textline-orientation disabled for speed."""

    name = "paddle"

    def __init__(self) -> None:
        try:
            import cv2  # noqa: F401
            import numpy as np  # noqa: F401
            from paddleocr import PaddleOCR
        except ImportError as exc:  # pragma: no cover - not installed in sandbox
            raise RuntimeError(
                "PaddleRecognizer requires paddleocr+opencv; install them or "
                "use backend='fake'"
            ) from exc
        self._engine = PaddleOCR(
            use_doc_orientation_classify=False,
            use_doc_unwarping=False,
            use_textline_orientation=False,
            lang="es",
        )

    def recognize(self, content: bytes | None, time_budget_s: float | None = None) -> RecognizeResult:  # pragma: no cover
        import cv2
        import numpy as np

        if content is None or len(content) == 0:
            return RecognizeResult([], error="decode_error")
        img = cv2.imdecode(np.frombuffer(bytes(content), np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            return RecognizeResult([], error="decode_error")
        result = self._engine.predict(img)
        lines = result[0]["rec_texts"] if result else []
        return RecognizeResult(list(lines))


class ProcessIsolatedRecognizer:
    """Hard-kill wrapper: runs the wrapped backend in ONE persistent child
    process per Python worker and ``kill()``s it on budget overrun — the
    distributed analogue of the reference's per-request ``mp.Process`` +
    ``terminate()`` (main.py:1233-1247), minus its per-request model reload.

    The soft in-UDF budget check cannot preempt a *hung* native inference
    call (it only fires after ``recognize`` returns); this wrapper can.
    Cost: one model copy + IPC per image — enable via
    ``PipelineConfig(hard_kill=True)`` when the backend can genuinely hang.
    """

    def __init__(self, backend: str, fake_work_iters: int = 0) -> None:
        self.backend = backend
        self.fake_work_iters = fake_work_iters
        self._proc = None
        self._conn = None

    @staticmethod
    def _worker_loop(backend: str, fake_work_iters: int, conn) -> None:
        recognizer = get_recognizer(backend, fake_work_iters)
        while True:
            try:
                content = conn.recv()
            except EOFError:
                return
            try:
                result = recognizer.recognize(content, None)
                conn.send((result.lines, result.error))
            except Exception as exc:
                conn.send(([], f"ocr_error:{exc}"))

    def _ensure(self) -> None:
        if self._proc is None or not self._proc.is_alive():
            import multiprocessing as mp

            # A child that died OUT OF BAND (OOM-kill, crash between
            # images) leaves the previous parent pipe end open; respawn
            # without closing it and every such death leaks an fd pair
            # for the life of the reused Python worker (the kill path in
            # recognize() already closes — this path must too).
            if self._conn is not None:
                try:
                    self._conn.close()
                except OSError:  # pragma: no cover - already closed
                    pass
                self._conn = None
            if self._proc is not None:
                self._proc.join()
                self._proc = None

            ctx = mp.get_context("fork")
            parent, child = ctx.Pipe()
            proc = ctx.Process(
                target=self._worker_loop,
                args=(self.backend, self.fake_work_iters, child),
                daemon=True,
            )
            proc.start()
            child.close()
            self._proc, self._conn = proc, parent

    def recognize(
        self, content: bytes | None, time_budget_s: float | None = None
    ) -> RecognizeResult:
        """``time_budget_s=None`` means the DEFAULT hard budget
        (:data:`DEFAULT_HARD_BUDGET_S`), never "wait forever": an
        unbounded ``poll(None)`` would hang on exactly the hung backend
        this wrapper exists to defend against."""
        self._ensure()
        if time_budget_s is None:
            time_budget_s = DEFAULT_HARD_BUDGET_S
        try:
            self._conn.send(content)
            if self._conn.poll(time_budget_s):
                lines, error = self._conn.recv()
                return RecognizeResult(lines, error)
        except (BrokenPipeError, EOFError, OSError):
            pass
        # Overrun or dead child: kill, respawn lazily on the next image.
        # Close the parent pipe end too, or every kill leaks one fd pair
        # for the life of the (reused) worker process.
        self._proc.kill()
        self._proc.join()
        try:
            self._conn.close()
        except OSError:  # pragma: no cover - already closed by the OS
            pass
        self._proc = None
        self._conn = None
        return RecognizeResult([], error="timeout")


_RECOGNIZER_CACHE: dict[tuple, object] = {}


def get_recognizer(backend: str = "fake", fake_work_iters: int = 0,
                   hard_kill: bool = False):
    """Executor-local singleton lookup (one model per Python worker).

    ``hard_kill=True`` returns the (equally cached) process-isolated
    wrapper: ONE persistent child per Python worker, reused across tasks —
    constructing it per ``mapInPandas`` task would fork + reload the model
    for every task under worker reuse, exactly the reference's
    per-request-reload defect (main.py:1203) this seam exists to avoid.
    """
    key = (backend, fake_work_iters, hard_kill)
    inst = _RECOGNIZER_CACHE.get(key)
    if inst is None:
        if hard_kill:
            inst = ProcessIsolatedRecognizer(backend, fake_work_iters)
        elif backend == "fake":
            inst = FakeRecognizer(work_iters_per_image=fake_work_iters)
        elif backend == "paddle":
            inst = PaddleRecognizer()
        else:
            raise ValueError(f"unknown recognizer backend: {backend}")
        _RECOGNIZER_CACHE[key] = inst
    return inst
