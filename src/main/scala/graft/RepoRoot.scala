package graft

/** Single resolution point for repo-anchored artifact paths (`BENCH/`,
  * `fixtures/`): overridable for non-default checkout locations via
  * `-Dgraft.repo.root` or `GRAFT_REPO_ROOT`, defaulting to the sandbox
  * checkout. Both the engine reads AND the DuckDB oracle SQL derive
  * their absolute paths from this one value, so relocating the checkout
  * cannot desync the two sides of a fixture-backed oracle.
  */
object RepoRoot {
  val dir: String = sys.props.get("graft.repo.root")
    .orElse(sys.env.get("GRAFT_REPO_ROOT"))
    .getOrElse("/root/repo")

  def fixtures: String = s"$dir/fixtures"
}
