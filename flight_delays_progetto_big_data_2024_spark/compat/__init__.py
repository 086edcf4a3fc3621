"""Environment-compatibility shims (host-discovered optional runtimes).

Nothing in here changes query semantics; each shim only widens WHICH
environments can run an already-gated operator end-to-end. Every shim
degrades to the pre-existing honest env gate when its host dependency
is absent.
"""
