"""RDF/XML source (driver-side SAX parse → distributed quads).

Reference: /root/reference/Sources/Kineo/RDF/RDFXML.swift:14-522 (a
state-machine SAX parser). Same architecture decision as the Turtle
path: RDF/XML is context-sensitive (striped node/property syntax,
xml:base/xml:lang inheritance), so the parse runs on the driver and the
resulting quads DataFrame is distributed; bulk loads at scale should
convert to N-Triples once and use the line-parallel loader.

Coverage: rdf:Description and typed node elements, rdf:about / rdf:ID /
rdf:nodeID, rdf:resource, rdf:datatype, xml:lang (inherited), xml:base
(inherited, for relative IRI resolution), nested node elements,
property attributes, rdf:li → rdf:_n, and parseType="Resource" /
"Collection" / "Literal".
"""

from __future__ import annotations

import xml.sax
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession

from kineo_spark.model import (
    IRI_DT, KIND_BLANK, KIND_IRI, KIND_LITERAL, NUMERIC_DTS, QUADS_SCHEMA, RDF_NS,
)

_XML_NS = "http://www.w3.org/XML/1998/namespace"

# rdf: attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {
    (RDF_NS, a) for a in
    ("about", "ID", "nodeID", "resource", "datatype", "parseType", "RDF",
     "Description", "li")
}


class _Frame:
    __slots__ = ("mode", "subject", "predicate", "text", "datatype",
                 "object_done", "lang", "base", "li_counter", "collection")

    def __init__(self, mode, lang, base):
        self.mode = mode            # "node" | "prop"
        self.subject = None         # (kind, lex) for node frames
        self.predicate = None       # IRI str for prop frames
        self.text = []
        self.datatype = None
        self.object_done = False
        self.lang = lang
        self.base = base
        self.li_counter = 0
        self.collection = None      # list of (kind, lex) under parseType=Collection


class _Handler(xml.sax.ContentHandler):
    def __init__(self, graph: str, base: str = ""):
        self.quads: list[tuple] = []
        self.graph = graph
        self.stack: list[_Frame] = []
        self._root_base = base
        self._bn = 0

    # -- helpers ----------------------------------------------------------
    def _fresh(self):
        self._bn += 1
        return (KIND_BLANK, f"rx{self._bn}")

    def _emit(self, s, p, o, dt=None, lang=None):
        from kineo_spark.model import lexical_num

        num = lexical_num(o[1], dt) if o[0] == KIND_LITERAL else None
        self.quads.append((
            s[0], s[1], p, o[0], o[1],
            dt if o[0] == KIND_LITERAL else None,
            lang if o[0] == KIND_LITERAL else None,
            num, self.graph,
        ))

    def _inherited(self, attr, default):
        for f in reversed(self.stack):
            v = getattr(f, attr)
            if v is not None:
                return v
        return default

    # -- SAX events -------------------------------------------------------
    def startElementNS(self, name, qname, attrs):
        uri, local = name
        lang = attrs.get((_XML_NS, "lang"))
        base = attrs.get((_XML_NS, "base"))
        cur_lang = lang if lang is not None else self._inherited("lang", None)
        cur_base = base if base is not None else self._inherited("base", self._root_base)

        if uri == RDF_NS and local == "RDF":
            self.stack.append(_Frame("root", cur_lang, cur_base))
            return

        parent = self.stack[-1] if self.stack else None
        in_node_pos = parent is None or parent.mode in ("root", "prop")

        if in_node_pos:
            f = _Frame("node", cur_lang, cur_base)
            about = attrs.get((RDF_NS, "about"))
            rid = attrs.get((RDF_NS, "ID"))
            nid = attrs.get((RDF_NS, "nodeID"))
            if about is not None:
                f.subject = (KIND_IRI, urljoin(cur_base, about) if cur_base else about)
            elif rid is not None:
                f.subject = (KIND_IRI, urljoin(cur_base, "#" + rid) if cur_base else "#" + rid)
            elif nid is not None:
                f.subject = (KIND_BLANK, nid)
            else:
                f.subject = self._fresh()
            # typed node element → rdf:type triple
            if not (uri == RDF_NS and local == "Description"):
                self._emit(f.subject, RDF_NS + "type", (KIND_IRI, (uri or "") + local))
            # property attributes
            for (auri, alocal), val in attrs.items():
                if auri == _XML_NS or (auri, alocal) in _SYNTAX_ATTRS or auri is None:
                    continue
                if auri == RDF_NS and alocal in ("about", "ID", "nodeID"):
                    continue
                self._emit(f.subject, (auri or "") + alocal,
                           (KIND_LITERAL, val), dt="langString" if cur_lang else "string",
                           lang=cur_lang)
            # connect to parent property
            if parent is not None and parent.mode == "prop":
                if parent.collection is not None:
                    parent.collection.append(f.subject)
                else:
                    psubj = self._node_parent_subject()
                    self._emit(psubj, parent.predicate, f.subject)
                    parent.object_done = True
            self.stack.append(f)
        else:
            # property position
            f = _Frame("prop", cur_lang, cur_base)
            if uri == RDF_NS and local == "li":
                parent.li_counter += 1
                f.predicate = f"{RDF_NS}_{parent.li_counter}"
            else:
                f.predicate = (uri or "") + local
            parse_type = attrs.get((RDF_NS, "parseType"))
            res = attrs.get((RDF_NS, "resource"))
            nid = attrs.get((RDF_NS, "nodeID"))
            f.datatype = attrs.get((RDF_NS, "datatype"))
            subj = parent.subject
            if parse_type == "Resource":
                # the property element itself acts as a node frame for a
                # fresh bnode: one frame, so the single end event pops it
                b = self._fresh()
                self._emit(subj, f.predicate, b)
                nf = _Frame("node", cur_lang, cur_base)
                nf.subject = b
                self.stack.append(nf)
                return
            if parse_type == "Collection":
                f.collection = []
                self.stack.append(f)
                return
            if parse_type == "Literal":
                # XML literal: capture flattened text (full XML fidelity
                # is out of scope; reference stores the serialized XML)
                f.datatype = RDF_NS + "XMLLiteral"
                self.stack.append(f)
                return
            if res is not None:
                self._emit(subj, f.predicate,
                           (KIND_IRI, urljoin(cur_base, res) if cur_base else res))
                f.object_done = True
            elif nid is not None:
                self._emit(subj, f.predicate, (KIND_BLANK, nid))
                f.object_done = True
            else:
                # property attributes on an empty property element → bnode
                prop_attrs = [
                    ((auri, alocal), val) for (auri, alocal), val in attrs.items()
                    if auri not in (None, _XML_NS) and (auri, alocal) not in _SYNTAX_ATTRS
                ]
                if prop_attrs:
                    b = self._fresh()
                    self._emit(subj, f.predicate, b)
                    for (auri, alocal), val in prop_attrs:
                        self._emit(b, (auri or "") + alocal, (KIND_LITERAL, val),
                                   dt="langString" if cur_lang else "string",
                                   lang=cur_lang)
                    f.object_done = True
            self.stack.append(f)

    def _node_parent_subject(self):
        for f in reversed(self.stack):
            if f.mode == "node" and f.subject is not None:
                return f.subject
        raise ValueError("rdfxml: nested node element with no parent subject")

    def characters(self, content):
        if self.stack and self.stack[-1].mode == "prop":
            self.stack[-1].text.append(content)

    def endElementNS(self, name, qname):
        uri, local = name
        if uri == RDF_NS and local == "RDF":
            if self.stack:
                self.stack.pop()
            return
        if not self.stack:
            return
        f = self.stack.pop()
        if f.mode == "prop":
            parent_subject = self._node_parent_subject() if self.stack else None
            if f.collection is not None:
                # close the rdf list
                prev = None
                head = (KIND_IRI, RDF_NS + "nil")
                for item in reversed(f.collection):
                    b = self._fresh()
                    self._emit(b, RDF_NS + "first", item)
                    self._emit(b, RDF_NS + "rest", head)
                    head = b
                self._emit(parent_subject, f.predicate, head)
            elif not f.object_done:
                text = "".join(f.text)
                if f.datatype:
                    dt_tok = IRI_DT.get(f.datatype, f.datatype)
                    self._emit(parent_subject, f.predicate,
                               (KIND_LITERAL, text), dt=dt_tok)
                elif f.lang:
                    self._emit(parent_subject, f.predicate, (KIND_LITERAL, text),
                               dt="langString", lang=f.lang)
                else:
                    self._emit(parent_subject, f.predicate, (KIND_LITERAL, text),
                               dt="string")
        elif f.mode == "node":
            # implicit node frame of parseType=Resource leaves its prop
            # frame on the stack; endElement of the property pops it next
            pass


def parse_rdfxml(text: str, default_graph: str = "urn:g:default",
                 base: str = "") -> list[tuple]:
    handler = _Handler(default_graph, base)
    parser = xml.sax.make_parser()
    parser.setFeature(xml.sax.handler.feature_namespaces, True)
    parser.setContentHandler(handler)
    import io
    parser.parse(io.StringIO(text))
    return handler.quads


def load_rdfxml(
    spark: SparkSession, path_or_text: str, default_graph: str = "urn:g:default",
    base: str = "",
) -> DataFrame:
    """Parse an RDF/XML document (path or literal text) into the flat
    quads DataFrame (FIXTURES §0 schema)."""
    import os

    text = path_or_text
    if os.path.exists(path_or_text):
        with open(path_or_text) as fh:
            text = fh.read()
    return spark.createDataFrame(parse_rdfxml(text, default_graph, base), QUADS_SCHEMA)


def serialize_rdfxml(quads: DataFrame) -> str:
    """Minimal RDF/XML serializer (driver-side, rdf:Description per
    subject) — enough for roundtrip testing and export."""
    from xml.sax.saxutils import escape, quoteattr

    rows = quads.collect()
    by_subj: dict[tuple, list] = {}
    for r in rows:
        by_subj.setdefault((r.s_kind, r.s_lex), []).append(r)
    out = [f'<rdf:RDF xmlns:rdf="{RDF_NS}">']
    from kineo_spark.model import DT_IRI
    for (sk, sl), grp in sorted(by_subj.items(), key=lambda kv: kv[0][1]):
        sattr = f"rdf:about={quoteattr(sl)}" if sk == KIND_IRI else f"rdf:nodeID={quoteattr(sl)}"
        out.append(f"  <rdf:Description {sattr}>")
        for r in sorted(grp, key=lambda r: (r.p_lex, r.o_lex)):
            # split predicate IRI into (namespace, local) at the last
            # name-start boundary
            p = r.p_lex
            cut = max(p.rfind("#"), p.rfind("/"), p.rfind(":"))
            ns, local = p[:cut + 1], p[cut + 1:]
            decl = f'xmlns:p={quoteattr(ns)}'
            if r.o_kind == KIND_IRI:
                out.append(f"    <p:{local} {decl} rdf:resource={quoteattr(r.o_lex)}/>")
            elif r.o_kind == KIND_BLANK:
                out.append(f"    <p:{local} {decl} rdf:nodeID={quoteattr(r.o_lex)}/>")
            else:
                extra = ""
                if r.o_lang:
                    extra = f' xml:lang={quoteattr(r.o_lang)}'
                elif r.o_dt and r.o_dt != "string":
                    dt_iri = DT_IRI.get(r.o_dt, r.o_dt)
                    extra = f" rdf:datatype={quoteattr(dt_iri)}"
                out.append(f"    <p:{local} {decl}{extra}>{escape(r.o_lex)}</p:{local}>")
        out.append("  </rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out)
