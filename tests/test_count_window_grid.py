"""Count-window closed form vs a direct simulation of the reference's
chained _WindowBuffer (towhee/runtime/nodes/_window.py:54-91) over a
(size, step, n) grid — validates the rowid+explode window-id formula used
by pipeline._compile_window for every shape, not just the 3 goldens."""


def buffer_sim(n: int, size: int, step: int) -> list[list[int]]:
    """Chained-buffer semantics: buffer k covers [k*step, k*step+size);
    created lazily as rows arrive in index order; flushed when complete or
    at seal if non-empty."""
    class Buf:
        def __init__(self, start):
            self.start, self.rows, self.nxt = start, [], None

        def feed(self, i):
            if i < self.start:
                return False
            if i < self.start + size:
                self.rows.append(i)
                if i >= self.start + step:
                    if self.nxt is None:
                        self.nxt = Buf(self.start + step)
                    self.nxt.feed(i)
                return False
            if self.nxt is None:
                self.nxt = Buf(self.start + step)
            self.nxt.feed(i)
            return True

    head, out = Buf(0), []
    for i in range(n):
        if head.feed(i) and head.rows:
            out.append(head.rows)
            head = head.nxt
    while head is not None and head.rows:
        out.append(head.rows)
        head = head.nxt
    return out


def formula(n: int, size: int, step: int) -> list[list[int]]:
    """The engine's closed form: index i belongs to window w iff
    w*step <= i < w*step+size, w >= 0 (pipeline.py:_compile_window)."""
    if n == 0:
        return []
    max_w = (n - 1) // step
    return [
        [i for i in range(w * step, min(w * step + size, n))]
        for w in range(max_w + 1)
        if [i for i in range(w * step, min(w * step + size, n))]
    ]


def test_grid():
    for n in (0, 1, 2, 5, 9, 17, 25):
        for size in range(1, 8):
            for step in range(1, 8):
                assert buffer_sim(n, size, step) == formula(n, size, step), (n, size, step)
