package graft.sources

/** Connector command construction — the native-vs-container argv logic
  * (reference `tap_airbyte/tap.py:441-455` `to_command`, runtime selection
  * via `OCI_RUNTIME` `tap.py:200`, bind mounts `tap.py:686-703`).
  *
  * Pure function: decides nothing about execution, just builds the argv that
  * [[SubprocessSource]] runs. Two modes:
  *   - native: a locally installed connector binary (the venv path of the
  *     reference) — `<binary> <args...>`
  *   - container: `<oci> run --rm -i [-v host:container[:mode]]... image:tag
  *     <args...>` — config/catalog/state files must be mounted so their
  *     in-container paths resolve.
  */
object CommandBuilder {

  final case class Mount(hostPath: String, containerPath: String, mode: String = "rw")

  def native(binary: String): Seq[String] = Seq(binary)

  def container(
      image: String,
      tag: String = "latest",
      ociRuntime: String = "docker",
      mounts: Seq[Mount] = Seq.empty,
      extraArgs: Seq[String] = Seq.empty): Seq[String] =
    Seq(ociRuntime, "run", "--rm", "-i") ++
      mounts.flatMap(m => Seq("-v", s"${m.hostPath}:${m.containerPath}:${m.mode}")) ++
      extraArgs ++
      Seq(s"$image:$tag")
}
