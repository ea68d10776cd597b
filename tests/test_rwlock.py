"""RWLock: the writer-preferring FIFO read/write lock behind the orchestrator's
read/write phases (reference: AsyncReadWriteLock, ReadWriteLock.swift:79-156).
"""
import threading
import time

import pytest

from wax_tpu.utils.concurrency import RWLock


class TestBasics:
    def test_readers_run_concurrently(self):
        lock = RWLock()
        inside = []
        barrier = threading.Barrier(3, timeout=10)

        def reader():
            with lock.read():
                inside.append(1)
                barrier.wait()  # all three must be inside the read phase AT ONCE

        ts = [threading.Thread(target=reader) for _ in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=10)
        assert len(inside) == 3

    def test_writer_excludes_readers_and_writers(self):
        lock = RWLock()
        state = {"writers": 0, "readers": 0, "max_w": 0, "bad": 0}
        mu = threading.Lock()

        def writer():
            for _ in range(40):
                with lock.write():
                    with mu:
                        state["writers"] += 1
                        state["max_w"] = max(state["max_w"], state["writers"])
                        if state["readers"]:
                            state["bad"] += 1
                    with mu:
                        state["writers"] -= 1

        def reader():
            for _ in range(40):
                with lock.read():
                    with mu:
                        state["readers"] += 1
                        if state["writers"]:
                            state["bad"] += 1
                    with mu:
                        state["readers"] -= 1

        ts = [threading.Thread(target=writer) for _ in range(2)] + [
            threading.Thread(target=reader) for _ in range(3)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert state["bad"] == 0 and state["max_w"] <= 1

    def test_reentrant_read(self):
        lock = RWLock()
        with lock.read():
            with lock.read():
                pass
        # fully released: a writer can proceed
        with lock.write():
            pass

    def test_reentrant_write_and_write_held_read(self):
        lock = RWLock()
        with lock.write():
            with lock.write():
                with lock.read():
                    pass
        with lock.write():
            pass

    def test_upgrade_raises(self):
        lock = RWLock()
        with lock.read():
            with pytest.raises(RuntimeError, match="upgrade"):
                lock.acquire_write()

    def test_unbalanced_release_raises(self):
        lock = RWLock()
        with pytest.raises(RuntimeError):
            lock.release_read()
        with pytest.raises(RuntimeError):
            lock.release_write()


class TestFairness:
    def test_tight_writer_loop_cannot_starve_peer_writer(self):
        """The regression behind the FIFO tickets: a flush-style tight write loop
        must let an interleaved writer through promptly."""
        lock = RWLock()
        stop = threading.Event()
        done = threading.Event()

        def spinner():
            while not stop.is_set():
                with lock.write():
                    pass

        def peer():
            for _ in range(25):
                with lock.write():
                    pass
            done.set()

        t1 = threading.Thread(target=spinner)
        t2 = threading.Thread(target=peer)
        t1.start()
        t2.start()
        ok = done.wait(timeout=20)
        stop.set()
        t1.join(timeout=10)
        t2.join(timeout=10)
        assert ok, "peer writer starved by tight writer loop"

    def test_writer_not_starved_by_reader_stream(self):
        lock = RWLock()
        stop = threading.Event()
        wrote = threading.Event()

        def reader_stream():
            while not stop.is_set():
                with lock.read():
                    time.sleep(0.001)

        readers = [threading.Thread(target=reader_stream) for _ in range(3)]
        for t in readers:
            t.start()

        def writer():
            with lock.write():
                wrote.set()

        time.sleep(0.05)
        w = threading.Thread(target=writer)
        w.start()
        ok = wrote.wait(timeout=10)
        stop.set()
        w.join(timeout=10)
        for t in readers:
            t.join(timeout=10)
        assert ok, "writer starved by continuous readers"


class TestAbandonedTickets:
    def test_exception_in_wait_does_not_deadlock_later_writers(self, monkeypatch):
        """Round-3 regression: a KeyboardInterrupt escaping cond.wait() used to
        leak the FIFO ticket and deadlock every future writer."""
        lock = RWLock()
        boom = {"armed": True}
        orig_wait = lock._cond.wait

        def flaky_wait(timeout=None):
            if boom["armed"]:
                boom["armed"] = False
                raise KeyboardInterrupt
            return orig_wait(timeout)

        failed = threading.Event()
        acquired = threading.Event()

        def doomed_writer():
            try:
                lock.acquire_write()
            except KeyboardInterrupt:
                failed.set()

        def later_writer():
            with lock.write():
                acquired.set()

        with lock.read():  # forces the doomed writer into wait()
            monkeypatch.setattr(lock._cond, "wait", flaky_wait)
            t1 = threading.Thread(target=doomed_writer)
            t1.start()
            assert failed.wait(timeout=10), "doomed writer did not raise"
            t1.join(timeout=10)
        t2 = threading.Thread(target=later_writer)
        t2.start()
        assert acquired.wait(timeout=10), "later writer deadlocked on leaked ticket"
        t2.join(timeout=10)
