"""index-writers.xml / exchanges.xml configuration — the reference's sink
wiring files, readable directly so an operator's EXISTING config drives this
engine's writers.

Parity targets:
- indexer/IndexWriters.java:152-190 (per-writer field mapping: copy adds the
  source's values to each dest, rename moves, remove drops; applied in that
  order) + the <writer id class><parameters><mapping> XML shape
  (conf/index-writers.xml.template, index-writers.xsd).
- exchange/Exchanges.java + exchange-jexl (conf/exchanges.xml.template): an
  exchange routes documents to its listed writers when its JEXL expression
  matches; the ``default`` exchange takes everything.

The known reference writer classes construct THIS engine's writers
(indexers.py) with their parameters mapped; unknown classes are reported,
not silently dropped.
"""

from __future__ import annotations

from xml.etree import ElementTree

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local(tag: str) -> str:
    return tag.rpartition("}")[2]


def parse_index_writers_xml(xml: str | bytes) -> list[dict]:
    """Writer configs from index-writers.xml: ``{id, class, params,
    mapping}`` per <writer>, where params is a flat dict and mapping is
    ``{"copy": [(src, [dests])], "rename": [(src, dest)], "remove":
    [fields]}`` in file order."""
    root = ElementTree.fromstring(xml)
    writers: list[dict] = []
    for w in root.iter():
        if _local(w.tag) != "writer":
            continue
        params: dict[str, str] = {}
        mapping = {"copy": [], "rename": [], "remove": []}
        for el in w.iter():
            if _local(el.tag) == "param" and el.get("name") is not None:
                params[el.get("name")] = el.get("value", "")
        # fields need their section context — walk copy/rename/remove blocks
        for section in w.iter():
            stag = _local(section.tag)
            if stag not in ("copy", "rename", "remove"):
                continue
            for field in section:
                if _local(field.tag) != "field":
                    continue
                src = field.get("source")
                if src is None:
                    continue
                if stag == "copy":
                    dests = [
                        d.strip()
                        for d in (field.get("dest") or "").split(",")
                        if d.strip()
                    ]
                    mapping["copy"].append((src, dests))
                elif stag == "rename":
                    mapping["rename"].append((src, field.get("dest") or src))
                else:
                    mapping["remove"].append(src)
        writers.append(
            {
                "id": w.get("id"),
                "class": w.get("class", ""),
                "params": params,
                "mapping": mapping,
            }
        )
    return writers


def apply_field_mapping(df: DataFrame, mapping: dict) -> DataFrame:
    """IndexWriters.mapDocument as a DataFrame transform, in the reference's
    order: COPY (source column duplicated to each dest; a dest equal to the
    source is skipped), RENAME (move), REMOVE (drop). Missing sources are
    ignored, like the reference's null checks. Pure projection — no shuffle."""

    def col(name: str):
        return F.col(f"`{name}`") if "." in name else F.col(name)

    out = df
    for src, dests in mapping.get("copy", ()):
        if src not in out.columns:
            continue
        for dest in dests:
            if dest != src:
                out = out.withColumn(dest, col(src))
    for src, dest in mapping.get("rename", ()):
        if src in out.columns and src != dest:
            out = out.withColumn(dest, col(src)).drop(src)
    for src in mapping.get("remove", ()):
        if src in out.columns:
            out = out.drop(src)
    return out


def parse_exchanges_xml(xml: str | bytes) -> dict[str, str | None]:
    """writer_id → JEXL expression (or None for take-everything) from
    exchanges.xml: JexlExchange entries contribute their ``expr`` param to
    every listed writer; the ``default`` exchange's writers get None.
    Feed the result straight into ``index_documents(exchanges=...)``
    (None-valued entries are simply omitted there)."""
    root = ElementTree.fromstring(xml)
    routes: dict[str, str | None] = {}
    for ex in root.iter():
        if _local(ex.tag) != "exchange":
            continue
        cls = ex.get("class", "")
        expr = None
        for el in ex.iter():
            if _local(el.tag) == "param" and el.get("name") == "expr":
                expr = el.get("value")
        for el in ex.iter():
            if _local(el.tag) == "writer" and el.get("id"):
                routes[el.get("id")] = None if cls == "default" else expr
    return routes


def build_index_writers(
    configs: list[dict], *, live: bool = False
) -> tuple[dict, list[str]]:
    """(writer_factories, unsupported_ids): map each known reference writer
    class to this engine's writer with its parameters translated. Factories
    are zero-arg callables for ``index_documents``. ``live=True`` opens the
    real transports (HTTP for Solr/ES/OpenSearch, AMQP for Rabbit) — the
    default keeps the fake-transport test posture so parsing a config never
    dials out on its own."""
    from nutch_spark.sources import indexers as ix

    factories: dict = {}
    unsupported: list[str] = []
    for cfg in configs:
        cls = cfg["class"].rsplit(".", 1)[-1]
        p = cfg["params"]
        wid = cfg["id"]
        if cls == "SolrIndexWriter":

            def make_solr(p=p):
                kwargs = dict(
                    urls=p.get("url", ""),
                    collection=p.get("collection") or None,
                    weight_field=p.get("weight.field") or "",
                    batch_size=int(p.get("commitSize", 1000) or 1000),
                )
                if p.get("auth", "false").lower() == "true":
                    kwargs.update(
                        username=p.get("username", ""), password=p.get("password", "")
                    )
                if live:
                    kwargs["live"] = True
                else:
                    kwargs["transport"] = lambda url, body, headers: None
                return ix.SolrIndexWriter(**kwargs)

            factories[wid] = make_solr
        elif cls in (
            "ElasticIndexWriter", "EsIndexWriter",
            "OpenSearchIndexWriter", "OpenSearch1xIndexWriter",
        ):
            es_cls = (
                ix.OpenSearchBulkIndexWriter
                if "OpenSearch" in cls
                else ix.EsBulkIndexWriter
            )

            def make_es(p=p, es_cls=es_cls):
                url = p.get("host", "localhost")
                port = p.get("port", "9200")
                kwargs = dict(index=p.get("index", "nutch"))
                if live:
                    kwargs["live_url"] = f"http://{url}:{port}"
                    return es_cls(None, **kwargs)
                return es_cls(lambda body: None, **kwargs)

            factories[wid] = make_es
        elif cls == "RabbitIndexWriter":

            def make_rabbit(p=p):
                import urllib.parse

                uri = urllib.parse.urlsplit(p.get("server.uri", "amqp://localhost"))
                if live:
                    from nutch_spark.sources.amqp_wire import amqp_publisher_factory

                    publish = amqp_publisher_factory(
                        uri.hostname or "localhost",
                        uri.port or 5672,
                        user=uri.username or "guest",
                        password=uri.password or "guest",
                        vhost=uri.path or "/",
                        exchange=p.get("exchange.name") or "nutch.exchange",
                        queue=p.get("queue.name") or "nutch.queue",
                        routing_key=p.get("routingkey") or "nutch.key",
                        declare=p.get("binding", "false").lower() != "false",
                    )().publish
                else:
                    publish = lambda *a, **k: None  # noqa: E731
                return ix.RabbitIndexWriter(
                    publish,
                    exchange=p.get("exchange.name") or "nutch.exchange",
                    routing_key=p.get("routingkey") or "nutch.key",
                    commit_size=int(p.get("commit.size", 250) or 250),
                    commit_mode=p.get("commit.mode", "multiple"),
                    headers_static=p.get("headers.static", ""),
                )

            factories[wid] = make_rabbit
        elif cls == "KafkaIndexWriter":

            def make_kafka(p=p):
                if live:
                    from nutch_spark.sources.kafka_wire import (
                        kafka_wire_producer_factory,
                    )

                    producer = kafka_wire_producer_factory(
                        f'{p.get("host", "localhost")}:{p.get("port", "9092")}'
                    )
                else:
                    class _Null:
                        def send(self, *a):
                            pass

                        def flush(self):
                            pass

                    producer = _Null  # zero-arg callable returning client
                return ix.KafkaIndexWriter(
                    producer, topic=p.get("topic", "nutch")
                )

            factories[wid] = make_kafka
        elif cls == "CSVIndexWriter":

            def make_csv(p=p):
                return ix.CsvIndexWriter(
                    p.get("outpath", p.get("path", "./csv-index")),
                    [
                        f.strip()
                        for f in p.get("fields", "id,title,content").split(",")
                        if f.strip()
                    ],
                )

            factories[wid] = make_csv
        elif cls == "CloudSearchIndexWriter":

            def make_cloudsearch(p=p):
                # the reference's indexer-cloudsearch reads an 'endpoint'
                # param (CloudSearchIndexWriter.java via the SDK domain
                # client); with one configured the live urllib transport
                # engages, otherwise the writer stays a dry-run stub
                endpoint = p.get("endpoint", "").strip()
                batch = int(p.get("batch", p.get("maxDocsInBatch", -1)) or -1)
                if endpoint:
                    return ix.CloudSearchIndexWriter(
                        live_url=endpoint, max_docs_in_batch=batch
                    )
                return ix.CloudSearchIndexWriter(
                    lambda body: None, max_docs_in_batch=batch
                )

            factories[wid] = make_cloudsearch
        elif cls == "DummyIndexWriter":

            def make_dummy(p=p):
                class _Dummy:
                    def open(self, pid):
                        self.rows = []

                    def write(self, docs):
                        self.rows.extend(docs)

                    def delete(self, ids):
                        pass

                    def commit(self):
                        pass

                return _Dummy()

            factories[wid] = make_dummy
        else:
            unsupported.append(f"{wid}:{cfg['class']}")
    return factories, unsupported
