package graft.sink

/** Shared SQL identifier quoting (knex's `??` binding): one definition so
  * an escaping fix cannot diverge between the JDBC writer and the schema
  * admin.
  */
private[sink] object SqlIdent {
  def quote(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""
}
