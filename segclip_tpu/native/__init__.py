"""Native C++ components, built on first use and loaded via ctypes."""
