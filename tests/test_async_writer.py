"""AsyncWriter: completion, error surfacing, backpressure."""
import threading
import time

import pytest

from pbe_tpu.utils.async_writer import AsyncWriter


def test_all_jobs_complete():
    done = []
    lock = threading.Lock()
    with AsyncWriter(workers=2, max_queue=4) as w:
        for i in range(20):
            def job(i=i):
                with lock:
                    done.append(i)
            w.submit(job)
    assert sorted(done) == list(range(20))


def test_error_reraised_on_close():
    w = AsyncWriter(workers=1, max_queue=2)

    def boom():
        raise ValueError("disk full")

    w.submit(boom)
    with pytest.raises(ValueError, match="disk full"):
        w.close()


def test_error_reraised_on_next_submit():
    w = AsyncWriter(workers=1, max_queue=2)

    def boom():
        raise RuntimeError("enc fail")

    w.submit(boom)
    time.sleep(0.2)  # let the worker hit the error
    with pytest.raises(RuntimeError, match="enc fail"):
        for _ in range(4):  # next submit must surface it
            w.submit(lambda: None)
            time.sleep(0.05)


def test_backpressure_bounds_queue():
    gate = threading.Event()
    started = time.time()
    with AsyncWriter(workers=1, max_queue=1) as w:
        w.submit(gate.wait)  # occupies the worker
        w.submit(lambda: None)  # fills the queue

        def unblock():
            time.sleep(0.3)
            gate.set()

        t = threading.Thread(target=unblock)
        t.start()
        w.submit(lambda: None)  # must block until the gate opens
        blocked_for = time.time() - started
        t.join()
    assert blocked_for >= 0.25
