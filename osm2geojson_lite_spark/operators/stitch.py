"""Greedy endpoint-stitching kernel (SURVEY.md §2.3 J5, §2.4 A2/A4).

Order-sensitive, destructive matching within one relation — no Catalyst
analog exists, so this runs inside the relation-assembly ``applyInPandas``
kernel. Reimplements the semantics of the reference's ``WayCollection``
(``way-collection.ts:11-123``): dual endpoint hash indexes keyed by the
stringified coordinate pair, array-order preference for the next segment,
EndStart/EndEnd/StartStart/StartEnd merge modes, and last-resort endpoint-map
probes. Coordinates stay string *tokens* until the merged string materializes
as floats (``utils.ts:83-89``).

Identity matters: the reference deindexes segments by ``===``; two segments
with identical coordinates are distinct. We therefore remove by object
identity (``is``), never by value equality.
"""

from __future__ import annotations

from ..functions.geometry import is_ring, ring_direction
from ..functions.jsnumber import parse_float_js

_END_START = 0
_END_END = 1
_START_START = 2
_START_END = 3


def _key(pt) -> str:
    return f"{pt[0]},{pt[1]}"


def _map_add(m: dict, k: str, v) -> None:
    m.setdefault(k, []).append(v)


def _map_remove(m: dict, k: str, v) -> None:
    a = m.get(k)
    if a:
        for i, x in enumerate(a):
            if x is v:
                del a[i]
                return


def _map_first(m: dict, k: str):
    a = m.get(k)
    return a[0] if a else None


class WayCollection:
    """Work-queue of token coordinate arrays with first/last endpoint maps."""

    def __init__(self):
        self.items: list[list] = []
        self.first_map: dict[str, list] = {}
        self.last_map: dict[str, list] = {}

    def add_way(self, coords: list) -> None:
        """coords: list of (lon_token, lat_token) pairs; empty ways skipped."""
        if coords:
            w = list(coords)
            self.items.append(w)
            _map_add(self.first_map, _key(w[0]), w)
            _map_add(self.last_map, _key(w[-1]), w)

    def _get_next_way(self, current: list):
        last_key = _key(current[-1])
        first_key = _key(current[0])
        # Step 1: prefer the next segment in array order (way-collection.ts:82-98)
        if self.items:
            nxt = self.items[0]
            nf, nl = _key(nxt[0]), _key(nxt[-1])
            if last_key == nf:
                return nxt, _END_START
            if last_key == nl:
                return nxt, _END_END
            if first_key == nf:
                return nxt, _START_START
            if first_key == nl:
                return nxt, _START_END
        # Step 2: endpoint-map fallbacks
        nxt = _map_first(self.first_map, last_key)
        if nxt is not None:
            return nxt, _END_START
        return _map_first(self.last_map, last_key), _END_END

    def merge_ways(self) -> list:
        """Greedy merge; returns float coordinate strings (lon, lat)."""
        strings = []
        while self.items:
            way = self.items.pop(0)
            _map_remove(self.first_map, _key(way[0]), way)
            _map_remove(self.last_map, _key(way[-1]), way)
            current = way
            while True:
                nxt, mode = self._get_next_way(current)
                if nxt is None:
                    break
                for i, x in enumerate(self.items):
                    if x is nxt:
                        del self.items[i]
                        break
                _map_remove(self.first_map, _key(nxt[0]), nxt)
                _map_remove(self.last_map, _key(nxt[-1]), nxt)
                if mode == _END_START:
                    current = current + nxt[1:]
                elif mode == _END_END:
                    nxt.reverse()
                    current = current + nxt[1:]
                elif mode == _START_START:
                    current.reverse()
                    current = current + nxt[1:]
                elif mode == _START_END:
                    current = nxt + current[1:]
                    current.reverse()
            strings.append(
                [[parse_float_js(pt[0]), parse_float_js(pt[1])] for pt in current]
            )
        return strings

    def to_rings(self, direction: str) -> list:
        """Merged strings -> closed rings normalized to ``direction``;
        open strings silently dropped (way-collection.ts:108-122)."""
        rings = []
        for s in self.merge_ways():
            if is_ring(s):
                if ring_direction(s) != direction:
                    s.reverse()
                rings.append(s)
        return rings
