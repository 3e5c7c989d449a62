"""tqdm shim: pass-through iterator (tqdm is not installed here)."""


def tqdm(iterable, *args, **kwargs):
    return iterable
