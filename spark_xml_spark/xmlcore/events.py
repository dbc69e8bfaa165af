"""Pull-style XML event stream over a single record string.

A Python analogue of the StAX event reader the reference drives its parser
with (/root/reference/src/main/scala/com/databricks/spark/xml/parsers/
StaxXmlParserUtils.scala:31-53): namespace-unaware, character-coalescing,
comments/PIs filtered out, DTD and external entities rejected (hardening,
StaxXmlParserUtils.scala:35-36).

Events are (kind, payload) tuples:
  (START, (name, [(attr_name, attr_value), ...]))
  (CHARS, text)
  (END, name)
  (END_DOC, None)
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Tuple
from xml.parsers import expat

from spark_xml_spark.options import XmlOptions

START = 0
CHARS = 1
END = 2
END_DOC = 3

Event = Tuple[int, object]


class XmlSecurityError(ValueError):
    """Raised for DTDs / external entity references (disabled, like the
    reference's IS_SUPPORTING_EXTERNAL_ENTITIES=false, SUPPORT_DTD=false)."""


def tokenize(xml: str) -> List[Event]:
    """Parse one XML record into a flat event list (adjacent character data
    coalesced, comments/PIs dropped). Raises on malformed input."""
    events: List[Event] = []
    chars: List[str] = []

    def flush() -> None:
        if chars:
            events.append((CHARS, "".join(chars)))
            chars.clear()

    p = expat.ParserCreate(namespace_separator=None)
    p.buffer_text = True

    def start(name, attrs):  # expat gives attrs as an ordered dict
        flush()
        events.append((START, (name, list(attrs.items()))))

    def end(name):
        flush()
        events.append((END, name))

    def chardata(data):
        chars.append(data)

    def doctype(*_a, **_k):
        raise XmlSecurityError("DTD is not supported")

    def external_entity(*_a, **_k):
        raise XmlSecurityError("external entities are not supported")

    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chardata
    p.StartDoctypeDeclHandler = doctype
    p.ExternalEntityRefHandler = external_entity

    try:
        p.Parse(xml, True)
    except expat.ExpatError as e:
        raise ValueError(f"malformed XML record: {e}") from e
    flush()
    events.append((END_DOC, None))
    return events


class EventStream:
    """peek/next cursor over an event list (StAX XMLEventReader analogue)."""

    __slots__ = ("_events", "_pos")

    def __init__(self, events: List[Event]):
        self._events = events
        self._pos = 0

    def peek(self) -> Event:
        return self._events[self._pos]

    def next(self) -> Event:
        ev = self._events[self._pos]
        if ev[0] != END_DOC:
            self._pos += 1
        return ev

    def has_next(self) -> bool:
        return self._events[self._pos][0] != END_DOC


def filtered_reader(xml: str) -> EventStream:
    return EventStream(tokenize(xml))


def gather_root_attributes(stream: EventStream) -> List[Tuple[str, str]]:
    """Advance past the record's root StartElement, returning its attributes
    (StaxXmlParserUtils.scala:55-59)."""
    while stream.has_next():
        kind, payload = stream.next()
        if kind == START:
            return list(payload[1])
    return []


def check_end_element(stream: EventStream) -> bool:
    """After an EndElement: does the enclosing object end here?
    (StaxXmlParserUtils.scala:76-87 — skip whitespace/characters between an
    EndElement and whatever follows.)"""
    while True:
        kind, _ = stream.peek()
        if kind in (END, END_DOC):
            return True
        if kind == START:
            return False
        stream.next()


def get_name(name: str, options: XmlOptions) -> str:
    """Local name, optionally namespace-stripped
    (StaxXmlParserUtils.scala:112-120)."""
    if options.ignore_namespace:
        return name.split(":")[-1]
    return name


def attributes_to_values_map(
    attributes: Iterable[Tuple[str, str]], options: XmlOptions
) -> List[Tuple[str, Optional[str]]]:
    """Attribute list -> prefixed (name, value) pairs
    (StaxXmlParserUtils.scala:92-107). Returns a list to keep XML order."""
    if options.exclude_attribute:
        return []
    out: List[Tuple[str, Optional[str]]] = []
    for name, value in attributes:
        key = options.attribute_prefix + get_name(name, options)
        if options.treat_empty_values_as_nulls and value.strip() == "":
            out.append((key, None))
        else:
            out.append((key, value))
    return out


_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def current_structure_as_string(stream: EventStream) -> str:
    """Re-serialize the current element body as an XML string, used when an
    explicit StringType schema captures mixed content verbatim
    (StaxXmlParserUtils.scala:125-153)."""
    out: List[str] = []
    depth = 0
    if stream.peek()[0] in (END, END_DOC):
        return ""
    while True:
        kind, payload = stream.next()
        if kind == START:
            name, attrs = payload
            out.append(f"<{name}")
            for k, v in attrs:
                out.append(f' {k}="{v}"')
            out.append(">")
            depth += 1
        elif kind == END:
            out.append(f"</{payload}>")
            depth -= 1
        elif kind == CHARS:
            out.append(payload)
        else:
            break
        nk, _ = stream.peek()
        if nk == END and depth <= 0:
            break
        if nk == END_DOC:
            break
    return "".join(out)


def skip_children(stream: EventStream) -> None:
    """Skip the current element's entire subtree without building values —
    the column-pruning fast path (StaxXmlParserUtils.scala:158-178).

    The element's own EndElement is left unconsumed (the enclosing object
    loop consumes it), matching the reference's loop structure."""
    depth = 0
    while True:
        kind, _ = stream.peek()
        if kind == END_DOC:
            return
        if kind == END:
            if depth == 0:
                return
            stream.next()
            depth -= 1
        elif kind == START:
            stream.next()
            depth += 1
        else:
            stream.next()


_WS_RE = re.compile(r"^\s*$")


def is_whitespace(data: str) -> bool:
    return _WS_RE.match(data) is not None
