"""Applications: the console golden path and evaluation tooling
(Apps/Console/console.cpp equivalents)."""
