"""Host-side batch loader with threaded workers and device prefetch.

Replaces the reference's torch ``DataLoader`` (``experiments/train.py:
273-290``) with a framework-free implementation: a thread pool maps
``dataset[i]`` over shuffled indices (audio decode is IO-bound and the
numpy resample/rasterize kernels release the GIL), batches are collated to
numpy, and :func:`device_prefetch` keeps the next batches in flight to the
TPU so host work overlaps the training step (SURVEY.md §7 "host pipeline").
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .collate import default_collate

__all__ = ["DataLoader", "device_prefetch"]


class DataLoader:
    """Iterate a dataset in collated batches with optional worker threads."""

    def __init__(self, dataset, batch_size, shuffle=False, num_workers=0,
                 drop_last=False, collate_fn=default_collate, seed=0,
                 prefetch_batches=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch_batches = max(1, prefetch_batches)
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        for b in range(n_batches):
            yield order[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self):
        if self.num_workers <= 0:
            for idcs in self._batches():
                yield self.collate_fn([self.dataset[i] for i in idcs])
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            batch_iter = self._batches()

            def submit_next():
                idcs = next(batch_iter, None)
                if idcs is None:
                    return False
                pending.append([pool.submit(self.dataset.__getitem__, i)
                                for i in idcs])
                return True

            for _ in range(self.prefetch_batches):
                if not submit_next():
                    break
            while pending:
                futures = pending.pop(0)
                submit_next()
                yield self.collate_fn([f.result() for f in futures])


def device_prefetch(iterator, transfer, depth=2):
    """Wrap a host batch iterator so device transfer overlaps consumption.

    ``transfer`` maps a host batch to device arrays (e.g. a sharded
    ``jax.device_put``). Up to ``depth`` batches are staged ahead on a
    background thread.
    """
    q = queue.Queue(maxsize=depth)
    sentinel = object()
    error = []

    def worker():
        try:
            for batch in iterator:
                q.put(transfer(batch))
        except BaseException as e:  # propagate to consumer
            error.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
