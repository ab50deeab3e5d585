"""Optional TensorBoard scalar logging.

The reference guards TensorBoard behind an import flag
(train_gui.py:33-37 ``TENSORBOARD_FOUND``) and logs train/test scalars in
``training_report`` (:666-712); stage 1 uses wandb (training.py:177-183).
Here both stages share one tiny guarded writer built on
``torch.utils.tensorboard`` (torch is already a dependency of the
checkpoint converters); when the import fails the writer is ``None`` and
logging silently degrades to the plain-text/JSON logs the metric scrapers
consume.
"""
from __future__ import annotations


def make_writer(logdir: str | None):
    """SummaryWriter for ``logdir``, or None (no dir / tensorboard absent)."""
    if not logdir:
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(logdir)
    except Exception:
        return None


def scalars(writer, step: int, **values) -> None:
    if writer is None:
        return
    for k, v in values.items():
        if v is not None:
            writer.add_scalar(k.replace("__", "/"), float(v), step)


def close(writer) -> None:
    """Flush + close (tensorboard buffers scalars on a daemon thread with a
    2-minute flush interval — without this, short runs lose everything)."""
    if writer is not None:
        writer.flush()
        writer.close()
