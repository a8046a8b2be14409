package graft.queries

/** The engine's full verifiable query inventory (SURVEY §2's coverage
  * checklist). Each batch file groups one capability area.
  */
object Registry {
  def all: Seq[QueryDef] =
    QueriesRelational.defs ++
      QueriesRelationalExt.defs ++
      QueriesStats.defs ++
      QueriesAggExt.defs ++
      QueriesWindowExt.defs ++
      QueriesEvents.defs ++
      QueriesText.defs ++
      QueriesDedup.defs ++
      QueriesSimilarity.defs ++
      QueriesIngest.defs ++
      QueriesPipeline.defs ++
      QueriesSampling.defs ++
      QueriesQuality.defs ++
      QueriesScaleExt.defs ++
      QueriesRound5.defs ++
      QueriesRound6.defs ++
      QueriesRound6b.defs ++
      QueriesRound6c.defs ++
      QueriesRound6d.defs ++
      QueriesRound6e.defs ++
      QueriesRound6f.defs ++
      QueriesRound6g.defs ++
      QueriesRound6h.defs ++
      QueriesRound6i.defs ++
      QueriesRound6j.defs ++
      QueriesRound6k.defs ++
      QueriesRound6l.defs ++
      QueriesRound6m.defs ++
      QueriesRound6n.defs ++
      QueriesRound6o.defs ++
      QueriesRound6p.defs ++
      QueriesRound6q.defs ++
      QueriesRound6r.defs ++
      QueriesRound6s.defs ++
      QueriesRound6t.defs ++
      QueriesRound6u.defs ++
      QueriesRound6v.defs ++
      QueriesRound7.defs ++
      QueriesRound7b.defs ++
      QueriesRound7c.defs ++
      QueriesRound7d.defs ++
      QueriesRound7e.defs ++
      QueriesRound7f.defs ++
      QueriesRound7g.defs ++
      QueriesRound7h.defs ++
      QueriesRound7i.defs ++
      QueriesRound7j.defs ++
      QueriesRound7k.defs ++
      QueriesRound7l.defs ++
      QueriesRound7m.defs ++
      QueriesRound7n.defs ++
      QueriesRound7o.defs ++
      QueriesRound7p.defs ++
      QueriesRound7q.defs ++
      QueriesRound7r.defs ++
      QueriesRound7s.defs ++
      QueriesRound7t.defs ++
      QueriesRound7u.defs ++
      QueriesRound7v.defs ++
      QueriesRound7w.defs ++
      QueriesRound7x.defs ++
      QueriesRound7y.defs ++
      QueriesRound7z.defs ++
      QueriesRound7aa.defs ++
      QueriesRound7ab.defs ++
      QueriesRound7ac.defs ++
      QueriesRound7ad.defs ++
      QueriesRound7ae.defs ++
      QueriesRound7af.defs ++
      QueriesRound7ag.defs ++
      QueriesRound7ah.defs ++
      QueriesRound7ai.defs ++
      QueriesRound7aj.defs ++
      QueriesRound7ak.defs ++
      QueriesRound7al.defs ++
      QueriesRound7am.defs ++
      QueriesRound7an.defs ++
      QueriesRound7ao.defs ++
      QueriesRound7ap.defs ++
      QueriesRound7aq.defs ++
      QueriesRound8.defs ++
      QueriesRound8b.defs ++
      QueriesRound8c.defs ++
      QueriesRound8d.defs ++
      QueriesRound8e.defs ++
      QueriesRound8f.defs ++
      QueriesRound8g.defs ++
      QueriesRound8h.defs ++
      QueriesRound8i.defs ++
      QueriesRound8j.defs ++
      QueriesRound8k.defs ++
      QueriesRound8l.defs ++
      QueriesRound8m.defs ++
      QueriesRound8n.defs ++
      QueriesRound8o.defs ++
      QueriesRound8p.defs ++
      QueriesRound8q.defs ++
      QueriesRound8r.defs

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
