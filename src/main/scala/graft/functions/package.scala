package graft

/** graft-namespace facades for native expressions that must live under
  * org.apache.spark.sql (they reference private[sql] Catalyst types).
  */
package object functions {
  val vector: org.apache.spark.sql.graft.vector.type = org.apache.spark.sql.graft.vector
  val aggregates: org.apache.spark.sql.graft.aggregates.type = org.apache.spark.sql.graft.aggregates
  val text: org.apache.spark.sql.graft.text.type = org.apache.spark.sql.graft.text
  val bloom: org.apache.spark.sql.graft.bloom.type = org.apache.spark.sql.graft.bloom
  val sketches: org.apache.spark.sql.graft.sketches.type = org.apache.spark.sql.graft.sketches
  val bpe: org.apache.spark.sql.graft.bpe.type = org.apache.spark.sql.graft.bpe
  val hindex: org.apache.spark.sql.graft.hindex.type = org.apache.spark.sql.graft.hindex
  val stringsim: org.apache.spark.sql.graft.stringsim.type = org.apache.spark.sql.graft.stringsim
  val multipattern: org.apache.spark.sql.graft.multipattern.type = org.apache.spark.sql.graft.multipattern
  val unigram: org.apache.spark.sql.graft.unigram.type = org.apache.spark.sql.graft.unigram
}
