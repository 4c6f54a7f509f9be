"""Background host fetch of device arrays (tunnel-aware D2H overlap).

On a remote-attached chip, `Array.copy_to_host_async()` only makes
progress while the client pumps its IO loop; a frame loop that is
always either dispatching or blocked in another fetch never idles, so
the "async" copy was being paid synchronously at collect time
(~35 ms/frame measured on the tunneled TPU — one full round trip).

A worker thread that simply blocks in `np.asarray` releases the GIL for
the whole transfer, pumping the channel for free: the copy lands while
the main thread keeps dispatching, and `get()` at collect time is
~0.03 ms (measured; concurrent fetches from two threads are safe under
PJRT's thread-safety guarantees).

The reference hides the same latency with its pthread pipeline
(FeatureTrack/ProcessMeasurements threads + queues, main.cpp:394-404);
here only the *fetch* needs a thread — dispatch stays on the main
thread so XLA program order is unchanged.
"""

from __future__ import annotations

import threading

import numpy as np


class AsyncFetch:
    """np.asarray(arr) in a daemon thread; join on get()."""

    __slots__ = ("_thread", "_out", "_err")

    def __init__(self, arr):
        self._out = None
        self._err = None
        self._thread = threading.Thread(
            target=self._run, args=(arr,), daemon=True)
        self._thread.start()

    def _run(self, arr):
        try:
            self._out = np.asarray(arr)
        except BaseException as e:      # re-raised at get()
            self._err = e

    def ready(self) -> bool:
        return not self._thread.is_alive()

    def get(self) -> np.ndarray:
        self._thread.join()
        if self._err is not None:
            raise self._err
        return self._out
