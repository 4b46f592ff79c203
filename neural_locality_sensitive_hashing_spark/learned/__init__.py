"""Learned space partitioner: offline numpy trainer + broadcast Arrow kernel."""
