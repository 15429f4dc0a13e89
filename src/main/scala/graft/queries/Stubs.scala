package graft.queries

/** Placeholder catalogs — filled in as the corresponding engine packages land. */
object TelemetryQueries extends Catalog { override def all: Seq[Q] = Seq.empty }
